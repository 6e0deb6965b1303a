from kaldi_aslp_tpu.gmm.diag_gmm import (
    AmDiagGmm,
    GmmStats,
    gmm_loglikes,
    mle_update,
    split_gaussians,
)
from kaldi_aslp_tpu.gmm.mono import MonophoneTrainer, MonoTrainOptions
