"""LDA / MLLT / fMLLR / segmentation tests (reference:
src/transform/ estimation classes; src/aslp-segment/)."""

import numpy as np
import pytest
import jax.numpy as jnp

from kaldi_aslp_tpu.feats.transforms import (
    FmllrStats,
    LdaStats,
    MlltStats,
    apply_transform,
    estimate_fmllr,
    estimate_lda,
    estimate_mllt,
)
from kaldi_aslp_tpu.ops.segment import ForwardMaxMatch


def test_lda_finds_discriminant_direction(rng):
    """Classes separated along one axis; LDA's top direction must align
    with it."""
    n = 400
    noise = rng.randn(n, 4)
    noise[:, 1:] *= 3.0  # high variance in non-discriminative dims
    classes = rng.randint(0, 2, n)
    feats = noise.copy()
    feats[:, 0] += classes * 10.0
    stats = LdaStats(2, 4)
    stats.accumulate(feats, classes)
    lda = estimate_lda(stats, target_dim=2)
    assert lda.shape == (2, 4)
    direction = np.abs(lda[0]) / np.linalg.norm(lda[0])
    assert direction[0] > 0.95  # top component ≈ axis 0
    out = np.asarray(apply_transform(feats.astype(np.float32), lda))
    assert out.shape == (n, 2)


def test_apply_affine_transform(rng):
    feats = rng.randn(5, 3).astype(np.float32)
    W = np.concatenate([2 * np.eye(3), np.ones((3, 1))], 1).astype(
        np.float32)
    out = np.asarray(apply_transform(feats, W))
    np.testing.assert_allclose(out, 2 * feats + 1.0, rtol=1e-5)


def test_mllt_identity_when_diagonal(rng):
    """If data is already diagonal-covariance per class, MLLT ≈ identity
    (up to permutation/sign); objective should not distort."""
    T, M, D = 500, 1, 3
    feats = rng.randn(T, D) * np.array([1.0, 2.0, 0.5])
    means = np.zeros((T, M, D))
    inv_vars = np.ones((T, M, D)) / np.array([1.0, 4.0, 0.25])
    gammas = np.ones((T, M))
    stats = MlltStats(D)
    stats.accumulate(feats, means, inv_vars, gammas)
    A = estimate_mllt(stats, num_iters=10)
    assert abs(abs(np.linalg.det(A)) - 1.0) < 1e-3
    off_diag = np.abs(A - np.diag(np.diag(A))).max()
    assert off_diag < 0.2


def test_fmllr_recovers_shift(rng):
    """Data shifted by a constant vs model at origin → fMLLR bias should
    move it back."""
    T, M, D = 600, 1, 3
    shift = np.array([2.0, -1.0, 0.5])
    feats = rng.randn(T, D) + shift
    means = np.zeros((T, M, D))
    inv_vars = np.ones((T, M, D))
    gammas = np.ones((T, M))
    stats = FmllrStats(D)
    stats.accumulate(feats, means, inv_vars, gammas)
    W = estimate_fmllr(stats, num_iters=15)
    out = np.asarray(apply_transform(feats.astype(np.float32), W))
    # transformed data should be ~N(0, I)
    assert np.abs(out.mean(0)).max() < 0.15
    np.testing.assert_allclose(out.std(0), 1.0, atol=0.15)


def test_forward_max_match():
    seg = ForwardMaxMatch(["北京", "大学", "北京大学", "生"])
    assert seg.segment("北京大学生") == ["北京大学", "生"]
    assert seg.segment("北京生大学") == ["北京", "生", "大学"]
    # OOV chars pass through singly
    assert seg.segment("X北京") == ["X", "北京"]
