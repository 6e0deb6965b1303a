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


def test_train_core_matches_scan_value_and_grads(rng):
    """The custom-VJP Pallas training core must match the scan path's
    outputs, final states and all parameter gradients (float32
    rounding), including masked streams and carried-in state."""
    import jax
    import jax.numpy as jnp
    from kaldi_aslp_tpu.models.recurrent import LstmProjectedStreams
    from kaldi_aslp_tpu.ops.lstm_pallas import lstmp_train_core

    S, T, D, C, P = 8, 12, 16, 128, 128
    comp = LstmProjectedStreams(D, P, cell_dim=C, pallas=False)
    params = comp.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(S, T, D).astype(np.float32))
    mask = np.ones((S, T), np.float32)
    mask[1, 8:] = 0
    mask[3, 5:] = 0
    mask = jnp.asarray(mask)
    state = {"c": jnp.asarray(0.1 * rng.randn(S, C).astype(np.float32)),
             "r": jnp.asarray(0.1 * rng.randn(S, P).astype(np.float32))}
    w_out = jnp.asarray(rng.randn(S, T, P).astype(np.float32))
    wc = jnp.asarray(rng.randn(S, C).astype(np.float32))
    wr = jnp.asarray(rng.randn(S, P).astype(np.float32))

    def scan_loss(p):
        ys, st = comp.apply(p, x, state=state, train=True, mask=mask)
        return (jnp.sum(ys * w_out) + jnp.sum(st["c"] * wc)
                + jnp.sum(st["r"] * wr))

    def pallas_loss(p):
        xg = jnp.einsum("std,gd->stg", x, p["w_gifo_x"]) + p["bias"]
        peep = jnp.stack([p["peephole_i_c"], p["peephole_f_c"],
                          p["peephole_o_c"]])
        ys, fc, fr = lstmp_train_core(
            xg, mask, p["w_gifo_r"], p["w_r_m"], peep,
            state["c"], state["r"], cell_clip=50.0, interpret=True)
        return (jnp.sum(ys * w_out) + jnp.sum(fc * wc)
                + jnp.sum(fr * wr))

    l1, g1 = jax.value_and_grad(scan_loss)(params)
    l2, g2 = jax.value_and_grad(pallas_loss)(params)
    assert float(jnp.abs(l1 - l2)) < 1e-4
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=2e-4, atol=2e-5,
            err_msg=k)


def test_train_core_stream_padding(rng):
    """Batches that are not block multiples are zero-padded internally
    and results sliced back."""
    import jax
    import jax.numpy as jnp
    from kaldi_aslp_tpu.ops.lstm_pallas import lstmp_train_core

    T, D, C, P = 6, 8, 128, 128
    rngk = jax.random.PRNGKey(1)
    w_r = 0.1 * jax.random.normal(rngk, (4 * C, P))
    w_rm = 0.1 * jax.random.normal(rngk, (P, C))
    peep = 0.1 * jax.random.normal(rngk, (3, C))
    for S in (3, 5):
        xg = jnp.asarray(rng.randn(S, T, 4 * C).astype(np.float32))
        mask = jnp.ones((S, T), jnp.float32)
        ys, fc, fr = lstmp_train_core(
            xg, mask, w_r, w_rm, peep,
            jnp.zeros((S, C)), jnp.zeros((S, P)), interpret=True)
        assert ys.shape == (S, T, P)
        assert fc.shape == (S, C) and fr.shape == (S, P)


def test_train_core_bf16_storage_grads(rng):
    """store_bf16 path (bf16 gates/state storage + hoisted weight-grad
    einsums) stays within bf16-rounding tolerance of the f32 scan."""
    import jax
    import jax.numpy as jnp
    from kaldi_aslp_tpu.models.recurrent import LstmProjectedStreams
    from kaldi_aslp_tpu.ops.lstm_pallas import lstmp_train_core

    S, T, D, C, P = 8, 12, 16, 128, 128
    comp = LstmProjectedStreams(D, P, cell_dim=C, pallas=False)
    params = comp.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(S, T, D).astype(np.float32))
    mask = np.ones((S, T), np.float32)
    mask[2, 7:] = 0
    mask = jnp.asarray(mask)
    state = {"c": jnp.zeros((S, C), jnp.float32),
             "r": jnp.zeros((S, P), jnp.float32)}
    w_out = jnp.asarray(rng.randn(S, T, P).astype(np.float32))

    def scan_loss(p):
        ys, _ = comp.apply(p, x, state=state, train=True, mask=mask)
        return jnp.sum(ys * w_out)

    def pallas_loss(p):
        xg = jnp.einsum("std,gd->stg", x, p["w_gifo_x"]) + p["bias"]
        peep = jnp.stack([p["peephole_i_c"], p["peephole_f_c"],
                          p["peephole_o_c"]])
        ys, fc, fr = lstmp_train_core(
            xg, mask, p["w_gifo_r"], p["w_r_m"], peep,
            state["c"], state["r"], cell_clip=50.0, interpret=True,
            store_bf16=True)
        return jnp.sum(ys.astype(jnp.float32) * w_out)

    l1, g1 = jax.value_and_grad(scan_loss)(params)
    l2, g2 = jax.value_and_grad(pallas_loss)(params)
    assert float(jnp.abs(l1 - l2)) / max(abs(float(l1)), 1.0) < 2e-2
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        denom = np.abs(a).max() + 1e-3
        assert np.abs(a - b).max() / denom < 5e-2, k


def test_bilstmp_fused_core_matches_generic(rng):
    """The fused bidirectional core (both directions in one grid step,
    reversed-time BlockSpec indexing) matches the generic two-call
    BLSTM path to bf16-storage tolerance, values AND grads."""
    import jax
    import jax.numpy as jnp
    from kaldi_aslp_tpu.models.recurrent import BLstmProjectedStreams
    from kaldi_aslp_tpu.ops.lstm_pallas import bilstmp_train_core

    S, T, D, C, P = 8, 10, 12, 128, 128
    comp = BLstmProjectedStreams(D, 2 * P, cell_dim=C, pallas=False)
    params = comp.init_params(jax.random.PRNGKey(3))
    x = jnp.asarray(rng.randn(S, T, D).astype(np.float32))
    mask = np.ones((S, T), np.float32)
    mask[1, 6:] = 0
    mask[4, 3:] = 0
    mask = jnp.asarray(mask)
    state = comp.init_state(S)
    w_out = jnp.asarray(rng.randn(S, T, 2 * P).astype(np.float32))
    wc = jnp.asarray(rng.randn(S, C).astype(np.float32))

    def generic_loss(p):
        ys, st = comp.apply(p, x, state=state, train=True, mask=mask)
        return jnp.sum(ys * w_out) + jnp.sum(st["fwd"]["c"] * wc)

    def fused_loss(p):
        pf, pb = p["fwd"], p["bwd"]
        xgf = jnp.einsum("std,gd->stg", x, pf["w_gifo_x"])
        xgb = jnp.einsum("std,gd->stg", x, pb["w_gifo_x"])
        peep_f = jnp.stack([pf["peephole_i_c"], pf["peephole_f_c"],
                            pf["peephole_o_c"]])
        peep_b = jnp.stack([pb["peephole_i_c"], pb["peephole_f_c"],
                            pb["peephole_o_c"]])
        ysf, ysb, fc, fr = bilstmp_train_core(
            xgf, xgb, mask, pf["w_gifo_r"], pf["w_r_m"], peep_f,
            pb["w_gifo_r"], pb["w_r_m"], peep_b,
            pf["bias"], pb["bias"],
            state["fwd"]["c"], state["fwd"]["r"],
            interpret=True, store_bf16=True, mxu_bf16=False)
        ys = jnp.concatenate([ysf, ysb], axis=-1).astype(jnp.float32)
        return jnp.sum(ys * w_out) + jnp.sum(fc * wc)

    l1, g1 = jax.value_and_grad(generic_loss)(params)
    l2, g2 = jax.value_and_grad(fused_loss)(params)
    assert abs(float(l1) - float(l2)) / max(abs(float(l1)), 1.0) < 2e-2
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    g2f = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, a in flat1:
        b = g2f[path]
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-3
        assert np.abs(a - b).max() / denom < 6e-2, path


@pytest.mark.parametrize("D", [128, 40])
def test_bilstmp_xfused_core_matches_generic(rng, D):
    """The x-fused core (input projection in-kernel, ALL weight grads
    accumulated in VMEM scratch — no xg/dxg/ms/drn HBM streams)
    matches the generic scan path, values AND grads, through the
    component's own weight layout.  D=40 exercises the zero-pad-to-
    lane-width path a stack's first layer takes (grads must slice the
    pad back out exactly)."""
    import jax
    import jax.numpy as jnp
    from kaldi_aslp_tpu.models.recurrent import BLstmProjectedStreams
    from kaldi_aslp_tpu.ops.lstm_pallas import bilstmp_xfused_train_core

    S, T, C, P = 8, 10, 64, 32
    comp = BLstmProjectedStreams(D, 2 * P, cell_dim=C, pallas=False)
    params = comp.init_params(jax.random.PRNGKey(5))
    x = jnp.asarray(rng.randn(S, T, D).astype(np.float32))
    mask = np.ones((S, T), np.float32)
    mask[2, 7:] = 0
    mask[5, 4:] = 0
    mask = jnp.asarray(mask)
    state = comp.init_state(S)
    w_out = jnp.asarray(rng.randn(S, T, 2 * P).astype(np.float32))
    wc = jnp.asarray(rng.randn(S, C).astype(np.float32))

    def generic_loss(p):
        ys, st = comp.apply(p, x, state=state, train=True, mask=mask)
        return jnp.sum(ys * w_out) + jnp.sum(st["fwd"]["c"] * wc)

    def xfused_loss(p):
        pf, pb = p["fwd"], p["bwd"]
        peep_f = jnp.stack([pf["peephole_i_c"], pf["peephole_f_c"],
                            pf["peephole_o_c"]])
        peep_b = jnp.stack([pb["peephole_i_c"], pb["peephole_f_c"],
                            pb["peephole_o_c"]])
        ysf, ysb, fc, fr = bilstmp_xfused_train_core(
            x, mask, pf["w_gifo_x"], pb["w_gifo_x"],
            pf["w_gifo_r"], pf["w_r_m"], peep_f,
            pb["w_gifo_r"], pb["w_r_m"], peep_b,
            pf["bias"], pb["bias"],
            state["fwd"]["c"], state["fwd"]["r"],
            interpret=True)
        ys = jnp.concatenate([ysf, ysb], axis=-1).astype(jnp.float32)
        return jnp.sum(ys * w_out) + jnp.sum(fc * wc)

    l1, g1 = jax.value_and_grad(generic_loss)(params)
    l2, g2 = jax.value_and_grad(xfused_loss)(params)
    assert abs(float(l1) - float(l2)) / max(abs(float(l1)), 1.0) < 2e-2
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    g2f = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, a in flat1:
        b = g2f[path]
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-3
        assert np.abs(a - b).max() / denom < 6e-2, path


def test_xfused_selected_for_any_input_width(rng, monkeypatch):
    """_apply_fused routes EVERY input width to the x-fused core —
    narrow first-layer feature dims are zero-padded to lane width
    inside the wrapper (the xg fallback's [T,S,4C] HBM streams cost
    ~2 GB/step on the flagship's first layer)."""
    import jax
    import jax.numpy as jnp
    from kaldi_aslp_tpu.models import recurrent as rec
    from kaldi_aslp_tpu.ops import lstm_pallas as lp

    calls = []
    orig_x = lp.bilstmp_xfused_train_core
    orig_g = lp.bilstmp_train_core
    monkeypatch.setattr(
        lp, "bilstmp_xfused_train_core",
        lambda *a, **k: calls.append("x") or orig_x(
            *a, **{**k, "interpret": True}))
    monkeypatch.setattr(
        lp, "bilstmp_train_core",
        lambda *a, **k: calls.append("g") or orig_g(
            *a, **{**k, "interpret": True}))

    for D in (128, 40):
        comp = rec.BLstmProjectedStreams(D, 2 * 32, cell_dim=64,
                                         pallas=True, bf16=True)
        params = comp.init_params(jax.random.PRNGKey(1))
        x = jnp.asarray(rng.randn(4, 6, D).astype(np.float32))
        calls.clear()
        comp.apply(params, x, train=True)
        assert calls == ["x"], (D, calls)

    # escape hatches still route to the xg fallback core (round-3
    # advisor: the env-gated fallback path must not rot silently)
    comp = rec.BLstmProjectedStreams(128, 2 * 32, cell_dim=64,
                                     pallas=True, bf16=True)
    params = comp.init_params(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.randn(4, 6, 128).astype(np.float32))
    monkeypatch.setenv("KALDI_ASLP_LSTM_NO_XFUSE", "1")
    calls.clear()
    comp.apply(params, x, train=True)
    assert calls == ["g"], calls
    monkeypatch.delenv("KALDI_ASLP_LSTM_NO_XFUSE")
    monkeypatch.setenv("KALDI_ASLP_LSTM_MXU_FP32", "1")
    calls.clear()
    comp.apply(params, x, train=True)
    assert calls == ["g"], calls
