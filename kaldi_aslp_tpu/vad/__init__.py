from kaldi_aslp_tpu.vad.vad import (
    Vad,
    VadOptions,
    EnergyVad,
    NnetVad,
    select_frames,
    ali_to_sil_targets,
)
from kaldi_aslp_tpu.vad.roc import RocPoint, roc_curve, auc, eer
