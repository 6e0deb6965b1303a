from kaldi_aslp_tpu.fst.fst import EPS, Arc, Fst, SymbolTable
from kaldi_aslp_tpu.fst.lang import (
    Lexicon,
    Lang,
    make_lexicon_fst,
    make_unigram_grammar,
    make_linear_acceptor,
    parse_arpa,
    arpa_to_fst,
)
from kaldi_aslp_tpu.fst.hclg import (
    expand_hmm,
    make_decode_graph,
    TrainingGraphCompiler,
)
from kaldi_aslp_tpu.fst.determinize import determinize, minimize_encoded
from kaldi_aslp_tpu.fst.context import ContextWindows, compose_context
from kaldi_aslp_tpu.fst.ctc_graph import (
    ctc_lut,
    expand_ctc,
    make_ctc_decode_graph,
)
