from kaldi_aslp_tpu.decoder.viterbi import (
    PackedGraph,
    ViterbiDecoder,
    equal_align,
)
