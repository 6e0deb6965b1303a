"""Pitch tracking tests (reference: feature-mfcc-test style golden
behavior: known tones → known f0)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.feats.pitch import (
    PitchOptions,
    compute_pitch,
    compute_pitch_batched,
    postprocess_pitch,
)


def _tone(f0, dur, sr=16000, amp=5000):
    t = np.arange(int(dur * sr)) / sr
    # add harmonics for realism
    return amp * (np.sin(2 * np.pi * f0 * t)
                  + 0.4 * np.sin(2 * np.pi * 2 * f0 * t)).astype(
        np.float32)


def test_pitch_tracks_tone():
    wave = _tone(220.0, 1.0)
    feats = compute_pitch(wave, PitchOptions())
    assert feats.shape[1] == 2
    f0 = np.exp(feats[5:-5, 1])
    assert abs(np.median(f0) - 220.0) < 8.0, np.median(f0)
    # POV (NCCF) high for clean periodic signal
    assert feats[5:-5, 0].mean() > 0.6


def test_pitch_follows_change():
    wave = np.concatenate([_tone(150.0, 0.5), _tone(300.0, 0.5)])
    feats = compute_pitch(wave, PitchOptions())
    T = len(feats)
    first = np.exp(np.median(feats[5:T // 2 - 5, 1]))
    second = np.exp(np.median(feats[T // 2 + 5:-5, 1]))
    assert abs(first - 150.0) < 10
    assert abs(second - 300.0) < 15


def test_pitch_noise_has_low_pov(rng):
    wave = (3000 * rng.randn(16000)).astype(np.float32)
    feats = compute_pitch(wave, PitchOptions())
    tone_feats = compute_pitch(_tone(220.0, 1.0), PitchOptions())
    assert feats[:, 0].mean() < tone_feats[:, 0].mean() - 0.2


def test_pitch_batched_matches_single(rng):
    """The bucketed device-batch extractor (FFT NCCF + in-jit Viterbi
    + device backtrace) must agree with the per-utterance path."""
    waves = {}
    for i, (f0, dur) in enumerate([(120.0, 0.8), (200.0, 1.3),
                                   (95.0, 2.1), (310.0, 1.0)]):
        w = _tone(f0, dur) + 100 * rng.randn(int(dur * 16000)).astype(
            np.float32)
        waves[f"u{i}"] = w
    opts = PitchOptions()
    batched = compute_pitch_batched(waves, opts, batch_size=3)
    for u, w in waves.items():
        ref = compute_pitch(w, opts)
        got = batched[u]
        assert got.shape == ref.shape
        # identical Viterbi problem; allow fp reassociation noise
        np.testing.assert_allclose(
            np.exp(got[:, 1]), np.exp(ref[:, 1]), atol=1.0)
        np.testing.assert_allclose(got[:, 0], ref[:, 0], atol=1e-5)


def test_postprocess_pitch():
    wave = _tone(200.0, 0.6)
    raw = compute_pitch(wave, PitchOptions())
    out = postprocess_pitch(raw)
    assert out.shape == (len(raw), 3)
    # mean-subtracted log pitch ≈ 0 for constant tone
    assert abs(out[10:-10, 1].mean()) < 0.05
