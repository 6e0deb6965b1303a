from kaldi_aslp_tpu.kws.kws import (
    KwsOptions,
    KeywordResult,
    KeywordSpotter,
)
