"""Feature pipeline composition.

Replaces the reference's per-decode shell pipe assembly
(reference: aslp_scripts/aslp_nnet/decode.sh:116-125 —
``copy-feats | apply-cmvn | add-deltas | splice-feats``) with an in-process
chain that stays on device between stages."""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from kaldi_aslp_tpu.utils.config import Config
from kaldi_aslp_tpu.feats.window import FrameExtractionOptions
from kaldi_aslp_tpu.feats.mel import MelBanksOptions
from kaldi_aslp_tpu.feats.fbank import Fbank, FbankOptions
from kaldi_aslp_tpu.feats.mfcc import Mfcc, MfccOptions
from kaldi_aslp_tpu.feats.functions import (
    DeltaFeaturesOptions,
    acc_cmvn_stats,
    add_deltas,
    apply_cmvn,
    splice_frames,
)


@dataclasses.dataclass
class FeaturePipelineOptions(Config):
    feature_type: str = "fbank"  # fbank|mfcc
    num_bins: int = 40           # fbank bins (ASLP recipes use 40)
    samp_freq: float = 16000.0
    dither: float = 1.0
    apply_cmvn: bool = True
    norm_vars: bool = False
    delta_order: int = 0
    splice_left: int = 0
    splice_right: int = 0


class FeaturePipeline:
    """wav → base features → CMVN → deltas → splice, batched per utterance."""

    def __init__(self, opts: FeaturePipelineOptions | None = None):
        self.opts = opts or FeaturePipelineOptions()
        frame_opts = FrameExtractionOptions(
            samp_freq=self.opts.samp_freq, dither=self.opts.dither
        )
        mel_opts = MelBanksOptions(num_bins=self.opts.num_bins)
        if self.opts.feature_type == "fbank":
            self.base = Fbank(frame_opts, mel_opts)
        elif self.opts.feature_type == "mfcc":
            self.base = Mfcc(frame_opts, MelBanksOptions())
        else:
            raise ValueError(f"unknown feature type {self.opts.feature_type}")

    @property
    def dim(self) -> int:
        d = self.base.dim
        d *= self.opts.delta_order + 1
        d *= self.opts.splice_left + 1 + self.opts.splice_right
        return d

    def compute_base(self, waveform, key=None) -> jnp.ndarray:
        return self.base(waveform, key)

    def post_process(
        self, feats: jnp.ndarray, cmvn_stats: Optional[np.ndarray] = None
    ) -> jnp.ndarray:
        if self.opts.apply_cmvn and cmvn_stats is not None:
            feats = apply_cmvn(feats, cmvn_stats, self.opts.norm_vars)
        if self.opts.delta_order > 0:
            feats = add_deltas(
                feats, DeltaFeaturesOptions(order=self.opts.delta_order)
            )
        if self.opts.splice_left or self.opts.splice_right:
            feats = splice_frames(
                feats, self.opts.splice_left, self.opts.splice_right
            )
        return feats

    def __call__(self, waveform, cmvn_stats=None, key=None) -> jnp.ndarray:
        return self.post_process(self.compute_base(waveform, key), cmvn_stats)


def compute_cmvn_stats_per_spk(
    feats_by_utt: Dict[str, np.ndarray], utt2spk: Dict[str, str]
) -> Dict[str, np.ndarray]:
    """Per-speaker stats (reference: steps/compute_cmvn_stats.sh)."""
    stats: Dict[str, np.ndarray] = {}
    for utt, feats in feats_by_utt.items():
        spk = utt2spk.get(utt, utt)
        stats[spk] = acc_cmvn_stats(np.asarray(feats), stats.get(spk))
    return stats
