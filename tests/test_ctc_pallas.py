"""Pallas CTC kernels vs the lax.scan implementation (op-equivalence
pattern of SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kaldi_aslp_tpu.ops.ctc import (
    NEG_INF,
    _transition_mask,
    ctc_alpha_beta,
    expand_labels,
)
from kaldi_aslp_tpu.ops.ctc_pallas import ctc_alpha_beta_pallas


def test_pallas_alpha_beta_match_scan(rng):
    S, T, V, U = 4, 18, 9, 5
    logits = rng.randn(S, T, V).astype(np.float32)
    labels = jnp.asarray(rng.randint(1, V, (S, U)).astype(np.int32))
    in_lens = jnp.asarray([18, 14, 11, 9])
    lab_lens = jnp.asarray([5, 4, 2, 1])
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), -1)

    nll, alphas, betas, lp_t, exp_labels, valid_u = ctc_alpha_beta(
        log_probs, labels, in_lens, lab_lens
    )
    skip_ok = _transition_mask(exp_labels, 0) * valid_u
    exp_lens = 2 * lab_lens + 1
    a_pal, b_pal = ctc_alpha_beta_pallas(
        lp_t, skip_ok, in_lens, exp_lens, interpret=True
    )

    def cmp(x, y, name):
        x, y = np.asarray(x), np.asarray(y)
        # compare only where the scan value is finite-ish (both represent
        # impossible cells as very-negative; exact floor differs)
        mask = (x > NEG_INF / 2) | (y > NEG_INF / 2)
        both = (x > NEG_INF / 2) & (y > NEG_INF / 2)
        assert (both == mask).all(), f"{name}: reachability differs"
        np.testing.assert_allclose(x[both], y[both], rtol=1e-4,
                                   atol=1e-4, err_msg=name)

    # alpha comparison only within active frames (scan holds alpha
    # frozen after input_lengths; kernel does the same)
    for s in range(S):
        Tl = int(in_lens[s])
        cmp(alphas[:Tl, s], a_pal[:Tl, s], f"alpha s={s}")
        cmp(betas[:Tl, s], b_pal[:Tl, s], f"beta s={s}")

    # loglikelihood from pallas alphas matches the scan nll
    u_idx = np.arange(alphas.shape[2])[None, :]
    last = np.asarray(in_lens) - 1
    a_last = np.asarray(a_pal)[last, np.arange(S)]
    at_end = np.where(
        (u_idx == np.asarray(exp_lens)[:, None] - 1)
        | (u_idx == np.asarray(exp_lens)[:, None] - 2),
        a_last, NEG_INF,
    )
    m = at_end.max(1, keepdims=True)
    logp = (m[:, 0] + np.log(np.exp(at_end - m).sum(1)))
    np.testing.assert_allclose(-logp, np.asarray(nll), rtol=1e-4)
