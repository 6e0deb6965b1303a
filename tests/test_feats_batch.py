"""Batched corpus feature extraction (feats/batch.py) equals the
per-utterance path exactly (same jitted _compute, padding only affects
frames past the true count)."""

import numpy as np
import jax
import pytest

from kaldi_aslp_tpu.feats import Fbank, FrameExtractionOptions, Mfcc
from kaldi_aslp_tpu.feats.batch import compute_batched


@pytest.mark.parametrize("maker", [Fbank, Mfcc])
def test_batched_matches_per_utterance(maker):
    ext = maker(FrameExtractionOptions(dither=0.0))
    rs = np.random.RandomState(0)
    waves = {f"u{i}": (rs.randn(int(rs.randint(3000, 36000))) * 500)
             .astype(np.float32) for i in range(9)}
    batched = compute_batched(ext, waves, batch_size=4)
    for u, w in waves.items():
        ref = np.asarray(ext(w))
        assert batched[u].shape == ref.shape
        np.testing.assert_allclose(batched[u], ref, rtol=1e-5, atol=1e-4)


def test_batched_with_dither_runs_and_differs_per_utt():
    ext = Fbank(FrameExtractionOptions(dither=1.0))
    rs = np.random.RandomState(1)
    w = (rs.randn(8000) * 500).astype(np.float32)
    waves = {"a": w.copy(), "b": w.copy()}
    out = compute_batched(ext, waves, batch_size=2,
                          key=jax.random.PRNGKey(7))
    assert out["a"].shape == out["b"].shape
    assert not np.allclose(out["a"], out["b"])  # distinct dither keys
