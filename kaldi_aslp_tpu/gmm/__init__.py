from kaldi_aslp_tpu.gmm.diag_gmm import (
    AmDiagGmm,
    GmmStats,
    gmm_loglikes,
    mle_update,
    split_gaussians,
)
from kaldi_aslp_tpu.gmm.mono import MonophoneTrainer, MonoTrainOptions
from kaldi_aslp_tpu.gmm.sat import (
    SatOptions,
    SatTrainer,
    estimate_speaker_transforms,
    apply_speaker_transforms,
)
from kaldi_aslp_tpu.gmm.deltas import DeltasTrainer, DeltasTrainOptions
from kaldi_aslp_tpu.gmm.ebw import (
    EbwOptions,
    ebw_update,
    accumulate_numerator_stats,
    accumulate_denominator_stats,
)
from kaldi_aslp_tpu.gmm.full_gmm import (
    AmFullGmm,
    full_gmm_loglikes,
    full_gmm_accumulate,
    full_gmm_mle_update,
)
