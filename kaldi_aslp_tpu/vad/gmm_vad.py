"""GMM-based VAD: class-conditional global GMMs + FSM smoothing.

Replaces (reference): aslp_scripts/vad/run_gmm_vad.sh — a silence GMM
and a speech GMM are trained on class-split frames
(train_diag_gmm.sh with mdl_prefix=sil / voice), and frames are
classified by log-likelihood ratio before the same kSilence/kSpeech
FSM smoothing the other detectors use (src/aslp-vad/vad.cc:34-80).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from kaldi_aslp_tpu.gmm.global_gmm import (
    GlobalGmm,
    global_gmm_loglikes,
    init_from_feats,
)
from kaldi_aslp_tpu.vad.vad import Vad, VadOptions


class GmmVad(Vad):
    """Speech if log p(x|speech) - log p(x|sil) > llr_threshold."""

    def __init__(self, sil_gmm: GlobalGmm, speech_gmm: GlobalGmm,
                 opts: Optional[VadOptions] = None,
                 llr_threshold: float = 0.0):
        super().__init__(opts)
        self.sil_gmm = sil_gmm
        self.speech_gmm = speech_gmm
        self.llr_threshold = llr_threshold

    def frame_scores(self, feats: np.ndarray) -> np.ndarray:
        """[T, D] -> [T] log-likelihood ratios (device, one batch)."""
        f = jnp.asarray(feats, jnp.float32)
        ll_sp = global_gmm_loglikes(
            f, jnp.asarray(self.speech_gmm.weights),
            jnp.asarray(self.speech_gmm.means),
            jnp.asarray(self.speech_gmm.vars))
        ll_sil = global_gmm_loglikes(
            f, jnp.asarray(self.sil_gmm.weights),
            jnp.asarray(self.sil_gmm.means),
            jnp.asarray(self.sil_gmm.vars))
        return np.asarray(ll_sp - ll_sil)

    def is_speech_frame(self, frame) -> bool:
        return bool(self.frame_scores(np.asarray(frame)[None])[0]
                    > self.llr_threshold)

    def detect(self, feats: np.ndarray) -> np.ndarray:
        return self.smooth(self.frame_scores(feats) > self.llr_threshold)


def train_gmm_vad(feats: np.ndarray, targets: np.ndarray,
                  num_gauss: int = 32, num_iters: int = 10,
                  opts: Optional[VadOptions] = None,
                  seed: int = 0) -> GmmVad:
    """Train sil + speech GMMs from frames and 0/1 targets
    (the run_gmm_vad.sh prep: ali-derived sil/speech frame split)."""
    feats = np.asarray(feats, np.float32)
    targets = np.asarray(targets)
    sil = init_from_feats(feats[targets == 0], num_gauss,
                          num_iters=num_iters, seed=seed)
    speech = init_from_feats(feats[targets == 1], num_gauss,
                             num_iters=num_iters, seed=seed + 1)
    return GmmVad(sil, speech, opts)
