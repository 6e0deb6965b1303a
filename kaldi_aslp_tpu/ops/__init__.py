from kaldi_aslp_tpu.ops.ctc import (
    ctc_loss,
    ctc_alpha_beta,
    expand_labels,
    ctc_greedy_decode,
    collapse_ctc_path,
)
from kaldi_aslp_tpu.ops.edit_distance import (
    edit_distance,
    align_errors,
    score_utterances,
    ErrorStats,
)
from kaldi_aslp_tpu.ops.segment import ForwardMaxMatch
