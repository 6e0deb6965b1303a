"""Feature-extraction tests.

The batched JAX implementation is validated against a slow per-frame numpy
re-derivation of the reference algorithm (reference: src/feat/
feature-window.cc, feature-fbank.cc, feature-mfcc.cc, mel-computations.cc,
feature-functions.cc) — analogous to the reference's GPU-vs-CPU
equivalence tests (SURVEY.md §4)."""

import math

import numpy as np
import pytest

from kaldi_aslp_tpu.feats import (
    DeltaFeaturesOptions,
    Fbank,
    FbankOptions,
    FrameExtractionOptions,
    MelBanksOptions,
    Mfcc,
    MfccOptions,
    acc_cmvn_stats,
    add_deltas,
    apply_cmvn,
    dct_matrix,
    mel_banks_matrix,
    num_frames,
    sliding_window_cmn,
    splice_frames,
    window_function,
)
from kaldi_aslp_tpu.feats.functions import delta_scales


def _ref_frame_pipeline(wave, opts, window):
    """Per-frame numpy mirror of the reference ProcessWindow chain."""
    n = num_frames(len(wave), opts)
    size, shift = opts.window_size, opts.window_shift
    frames = []
    energies = []
    for i in range(n):
        frame = wave[i * shift: i * shift + size].astype(np.float64).copy()
        frame -= frame.mean()
        energies.append(math.log(max((frame ** 2).sum(), 1e-38)))
        pre = frame.copy()
        for j in range(size - 1, 0, -1):
            pre[j] -= opts.preemphasis_coefficient * pre[j - 1]
        pre[0] -= opts.preemphasis_coefficient * pre[0]
        frames.append(pre * window)
    return np.array(frames), np.array(energies)


@pytest.fixture
def wave(rng):
    return (rng.randn(16000) * 1000).astype(np.float32)  # 1s @ 16k


def test_num_frames():
    opts = FrameExtractionOptions()
    assert opts.window_size == 400 and opts.window_shift == 160
    assert opts.padded_window_size == 512
    assert num_frames(16000, opts) == 98  # (16000-400)/160+1
    assert num_frames(399, opts) == 0


def test_povey_window():
    opts = FrameExtractionOptions()
    w = window_function(opts)
    assert w.shape == (400,)
    assert w[0] == pytest.approx(0.0, abs=1e-6)
    mid = (0.5 - 0.5 * math.cos(2 * math.pi * 200 / 399)) ** 0.85
    assert w[200] == pytest.approx(mid, rel=1e-5)


def test_fbank_matches_per_frame_reference(wave):
    opts = FrameExtractionOptions(dither=0.0)
    mel_opts = MelBanksOptions(num_bins=23)
    fb = Fbank(opts, mel_opts, FbankOptions())
    got = np.asarray(fb(wave))

    window = window_function(opts).astype(np.float64)
    frames, _ = _ref_frame_pipeline(wave, opts, window)
    padded = np.zeros((frames.shape[0], opts.padded_window_size))
    padded[:, :400] = frames
    spec = np.fft.rfft(padded, axis=1)
    power = np.abs(spec) ** 2
    mel = mel_banks_matrix(mel_opts, opts).astype(np.float64)
    want = np.log(np.maximum(power[:, :-1] @ mel, 1e-38))

    assert got.shape == want.shape == (98, 23)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_mfcc_matches_per_frame_reference(wave):
    opts = FrameExtractionOptions(dither=0.0)
    mel_opts = MelBanksOptions(num_bins=23)
    mf = Mfcc(opts, mel_opts, MfccOptions())
    got = np.asarray(mf(wave))
    assert got.shape == (98, 13)

    window = window_function(opts).astype(np.float64)
    frames, energies = _ref_frame_pipeline(wave, opts, window)
    padded = np.zeros((frames.shape[0], opts.padded_window_size))
    padded[:, :400] = frames
    power = np.abs(np.fft.rfft(padded, axis=1)) ** 2
    mel = mel_banks_matrix(mel_opts, opts).astype(np.float64)
    logmel = np.log(np.maximum(power[:, :-1] @ mel, 1e-38))
    dct = dct_matrix(13, 23).astype(np.float64)
    want = logmel @ dct.T
    lifter = 1.0 + 0.5 * 22.0 * np.sin(math.pi * np.arange(13) / 22.0)
    want *= lifter
    want[:, 0] = energies  # use_energy=True replaces c0
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mel_banks_properties():
    opts = FrameExtractionOptions()
    mel = mel_banks_matrix(MelBanksOptions(num_bins=23), opts)
    assert mel.shape == (256, 23)
    assert (mel >= 0).all() and mel.max() <= 1.0
    # every bin has some support; triangles overlap
    assert (mel.sum(axis=0) > 0).all()


def test_dct_orthogonal():
    d = dct_matrix(23, 23).astype(np.float64)
    np.testing.assert_allclose(d @ d.T, np.eye(23), atol=1e-5)


def test_delta_scales_standard():
    # order-1 window-2 regression: [-.2 -.1 0 .1 .2]
    scales = delta_scales(DeltaFeaturesOptions(order=2, window=2))
    np.testing.assert_allclose(
        scales[1], [-0.2, -0.1, 0.0, 0.1, 0.2], atol=1e-7
    )
    assert len(scales[2]) == 9


def test_add_deltas_shape_and_interior(rng):
    feats = rng.randn(20, 5).astype(np.float32)
    out = np.asarray(add_deltas(feats))
    assert out.shape == (20, 15)
    np.testing.assert_allclose(out[:, :5], feats, atol=1e-6)
    # interior frame delta = sum_j j*x[t+j] / 10
    t = 10
    want = sum(j * feats[t + j] for j in range(-2, 3)) / 10.0
    np.testing.assert_allclose(out[t, 5:10], want, rtol=1e-5, atol=1e-5)


def test_splice_frames(rng):
    feats = rng.randn(6, 3).astype(np.float32)
    out = np.asarray(splice_frames(feats, 2, 2))
    assert out.shape == (6, 15)
    np.testing.assert_array_equal(out[3, :3], feats[1])   # offset -2
    np.testing.assert_array_equal(out[3, 6:9], feats[3])  # center
    np.testing.assert_array_equal(out[0, :3], feats[0])   # edge clamp


def test_cmvn(rng):
    feats = rng.randn(200, 8).astype(np.float32) * 3 + 5
    stats = acc_cmvn_stats(feats)
    assert stats.shape == (2, 9)
    assert stats[0, 8] == 200
    out = np.asarray(apply_cmvn(feats, stats, norm_vars=True))
    np.testing.assert_allclose(out.mean(axis=0), 0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=0), 1, atol=1e-3)


def test_sliding_window_cmn(rng):
    feats = rng.randn(50, 4).astype(np.float32) + 10
    out = np.asarray(sliding_window_cmn(feats))
    # window covers everything (T < min_window would clamp): mean removed
    assert abs(out[-1].mean()) < 5  # sanity: demeaned scale
    # frame 49: trailing window = all 50 frames (cmn_window=600 > T)
    want = feats[49] - feats[:50].mean(axis=0)
    np.testing.assert_allclose(out[49], want, atol=1e-4)
    # frame 0 uses min(min_window, T) leading frames
    want0 = feats[0] - feats[:50].mean(axis=0)
    np.testing.assert_allclose(out[0], want0, atol=1e-4)
