"""VAD-gated streaming feature pipeline (reference:
src/aslp-online/online-feature-pipeline.h OnlineVadFeaturePipeline —
features only flow for speech regions; silence is dropped before the
decoder, with utterance segmentation driven by the VAD FSM)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from kaldi_aslp_tpu.online.feature_pipeline import (
    OnlineFeatureOptions,
    OnlineFeaturePipeline,
)
from kaldi_aslp_tpu.vad.vad import EnergyVad, Vad, VadOptions


class OnlineVadFeaturePipeline:
    """Wraps an OnlineFeaturePipeline with a frame-level VAD gate.

    accept_waveform returns (speech_frames, segment_boundary): frames
    classified as speech since the last call, plus True when a
    speech→silence transition completed (utterance boundary — the
    decode-thread resets the decoder there,
    reference: decode-thread.cc:162-254)."""

    def __init__(
        self,
        feature_opts: Optional[OnlineFeatureOptions] = None,
        vad: Optional[Vad] = None,
    ):
        self.features = OnlineFeaturePipeline(feature_opts)
        self.vad = vad or EnergyVad(VadOptions())
        self.reset()

    def reset(self) -> None:
        self.features.reset()
        self._raw: List[np.ndarray] = []
        self._in_speech = False
        self._noise_floor: Optional[float] = None

    @property
    def dim(self) -> int:
        return self.features.dim

    def accept_waveform(self, samples: np.ndarray
                        ) -> Tuple[np.ndarray, bool]:
        frames = self.features.accept_waveform(samples)
        if len(frames) == 0:
            return np.zeros((0, self.dim), np.float32), False
        # voicing score: log total mel energy (logsumexp over log-mel
        # bins) against an adaptive noise floor (running min with slow
        # decay) — absolute thresholds don't transfer across gains
        m = frames.max(axis=1, keepdims=True)
        score = (m[:, 0]
                 + np.log(np.exp(frames - m).sum(axis=1) + 1e-10))
        lo = float(score.min())
        self._noise_floor = (lo if self._noise_floor is None
                             else min(self._noise_floor * 0.99 + lo * 0.01,
                                      lo))
        margin = float(getattr(self.vad.opts, "energy_threshold", 8.0))
        voiced = score > self._noise_floor + margin
        smoothed = self.vad.smooth(voiced)
        boundary = False
        if self._in_speech and not smoothed.any():
            boundary = True
            self._in_speech = False
        elif smoothed.any():
            self._in_speech = True
        return frames[smoothed], boundary
