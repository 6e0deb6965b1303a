"""EBW/MMI discriminative update tests (reference: ebw-diag-gmm.cc)."""

import numpy as np
import pytest
import jax.numpy as jnp

from kaldi_aslp_tpu.gmm import AmDiagGmm, gmm_loglikes
from kaldi_aslp_tpu.gmm.ebw import (
    EbwOptions,
    accumulate_denominator_stats,
    accumulate_numerator_stats,
    ebw_update,
)


def _overlapping_model_and_data(rng):
    """Two pdfs with overlapping gaussians; data separable but the model
    under-separates → MMI should push the means apart."""
    am = AmDiagGmm(
        weights=np.ones((2, 1), np.float32),
        means=np.array([[[-0.5, 0.0]], [[0.5, 0.0]]], np.float32),
        vars=np.ones((2, 1, 2), np.float32) * 2.0,
    )
    n = 400
    f0 = rng.randn(n, 2) * 0.8 + [-2.0, 0.0]
    f1 = rng.randn(n, 2) * 0.8 + [2.0, 0.0]
    feats = np.concatenate([f0, f1]).astype(np.float32)
    pdfs = np.concatenate([np.zeros(n), np.ones(n)]).astype(np.int32)
    return am, feats, pdfs


def _frame_accuracy(am, feats, pdfs):
    ll = np.asarray(gmm_loglikes(jnp.asarray(feats), *am.pack()))
    return float((ll.argmax(1) == pdfs).mean())


def test_ebw_update_improves_discrimination(rng):
    am, feats, pdfs = _overlapping_model_and_data(rng)
    acc0 = _frame_accuracy(am, feats, pdfs)
    num = accumulate_numerator_stats(am, feats, pdfs)
    den = accumulate_denominator_stats(am, feats)
    am2 = ebw_update(am, num, den, EbwOptions(ebw_e=2.0))
    acc1 = _frame_accuracy(am2, feats, pdfs)
    assert acc1 >= acc0
    # means moved apart along the discriminative axis
    gap0 = am.means[1, 0, 0] - am.means[0, 0, 0]
    gap1 = am2.means[1, 0, 0] - am2.means[0, 0, 0]
    assert gap1 > gap0


def test_ebw_variances_stay_positive(rng):
    am, feats, pdfs = _overlapping_model_and_data(rng)
    num = accumulate_numerator_stats(am, feats, pdfs)
    den = accumulate_denominator_stats(am, feats)
    am2 = ebw_update(am, num, den, EbwOptions(ebw_e=0.5, min_d=0.1))
    assert (am2.vars > 0).all()
    np.testing.assert_allclose(am2.weights.sum(1), 1.0, atol=1e-5)
