from kaldi_aslp_tpu.feats.window import (
    FrameExtractionOptions,
    num_frames,
    window_function,
    extract_frames,
    process_window,
    compute_power_spectrum,
)
from kaldi_aslp_tpu.feats.mel import MelBanksOptions, mel_banks_matrix
from kaldi_aslp_tpu.feats.fbank import Fbank, FbankOptions
from kaldi_aslp_tpu.feats.mfcc import Mfcc, MfccOptions, dct_matrix, lifter_coeffs
from kaldi_aslp_tpu.feats.functions import (
    DeltaFeaturesOptions,
    add_deltas,
    splice_frames,
    acc_cmvn_stats,
    apply_cmvn,
    SlidingWindowCmnOptions,
    sliding_window_cmn,
)
from kaldi_aslp_tpu.feats.pipeline import (
    FeaturePipeline,
    FeaturePipelineOptions,
    compute_cmvn_stats_per_spk,
)
from kaldi_aslp_tpu.feats.transforms import (
    LdaStats,
    estimate_lda,
    MlltStats,
    estimate_mllt,
    FmllrStats,
    estimate_fmllr,
    apply_transform,
    gmm_gammas_for_alignment,
)
from kaldi_aslp_tpu.feats.plp import Plp, PlpOptions, Spectrogram
from kaldi_aslp_tpu.feats.resample import resample_waveform, add_noise
from kaldi_aslp_tpu.feats.pitch import PitchOptions, compute_pitch, postprocess_pitch
