"""Pallas LSTMP kernel vs lax.scan equivalence (interpreter mode on CPU;
the op-level GPU-vs-CPU equivalence pattern of SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kaldi_aslp_tpu.models.recurrent import LstmProjectedStreams
from kaldi_aslp_tpu.ops.lstm_pallas import (
    lstmp_forward_pallas_from_params,
)


@pytest.mark.parametrize("S,T,D,C,P", [(8, 12, 16, 32, 16),
                                       (4, 7, 8, 16, 8)])
def test_pallas_matches_scan(rng, S, T, D, C, P):
    cell = LstmProjectedStreams(D, P, cell_dim=C)
    params = cell.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(S, T, D).astype(np.float32) * 0.1)
    mask = jnp.sort(
        jnp.asarray((rng.rand(S, T) > 0.2).astype(np.float32)), axis=1
    )[:, ::-1]
    y_ref, s_ref = cell.apply(params, x, mask=mask)
    y_pal, s_pal = lstmp_forward_pallas_from_params(params, x, mask)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_pal["c"]),
                               np.asarray(s_ref["c"]), rtol=1e-5,
                               atol=1e-6)


def test_pallas_streaming_state(rng):
    S, T, D, C, P = 4, 10, 8, 16, 8
    cell = LstmProjectedStreams(D, P, cell_dim=C)
    params = cell.init_params(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.randn(S, T, D).astype(np.float32) * 0.1)
    y_full, _ = lstmp_forward_pallas_from_params(params, x)
    y1, s1 = lstmp_forward_pallas_from_params(params, x[:, :4])
    y2, _ = lstmp_forward_pallas_from_params(params, x[:, 4:], state=s1)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], axis=1)),
        np.asarray(y_full), rtol=1e-5, atol=1e-6,
    )
