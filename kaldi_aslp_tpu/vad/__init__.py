from kaldi_aslp_tpu.vad.vad import (
    Vad,
    VadOptions,
    EnergyVad,
    NnetVad,
    select_frames,
    ali_to_sil_targets,
)
from kaldi_aslp_tpu.vad.roc import RocPoint, roc_curve, auc, eer
from kaldi_aslp_tpu.vad.gmm_vad import GmmVad, train_gmm_vad
from kaldi_aslp_tpu.vad.textgrid import (
    intervals_to_textgrid,
    parse_interval_file,
)
