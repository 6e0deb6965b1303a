from kaldi_aslp_tpu.decoder.viterbi import (
    PackedGraph,
    ViterbiDecoder,
    equal_align,
)
from kaldi_aslp_tpu.decoder.batched import BatchedViterbiDecoder
from kaldi_aslp_tpu.decoder.beam import (BatchedBeamDecoder,
    BeamSearchDecoder, CsrGraph)
from kaldi_aslp_tpu.decoder.lattice import (
    Lattice,
    generate_lattice,
    lattice_best_path,
    score_lmwt_sweep,
)
from kaldi_aslp_tpu.decoder.compact import (
    CompactLattice,
    StateLattice,
    compact_lattice_best_path,
    compact_lattice_lmrescore,
    DeterminizeFailed,
    determinize_lattice,
    determinize_lattice_pruned,
    lattice_to_state,
    scale_lattice,
    state_lattice_best_path,
    state_to_lattice,
)
from kaldi_aslp_tpu.decoder.mbr import (
    lattice_arc_posteriors,
    minimum_bayes_risk,
)
from kaldi_aslp_tpu.decoder.online import OnlineViterbiDecoder
from kaldi_aslp_tpu.decoder.decodable import (
    PdfPrior,
    NnetForwardOptions,
    nnet_forward,
)
from kaldi_aslp_tpu.decoder.nbest import (
    NBestEntry,
    lattice_nbest,
    lm_score_words,
    rescore_nbest,
)
