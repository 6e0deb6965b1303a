from kaldi_aslp_tpu.kws.kws import (
    KwsOptions,
    KeywordResult,
    KeywordSpotter,
)
from kaldi_aslp_tpu.kws.state_map import (
    KwsStateMap,
    convert_phone_ali,
    gen_state_map,
    read_phone_map,
    roc_sweep,
    write_state_map,
)
