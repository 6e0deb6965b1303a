"""Pallas CTC alpha/beta kernels: the forward-backward recursions as
sequential-grid kernels with the [S, U'] state held in VMEM.

Replaces (reference) the per-timestep CUDA kernel launches of
cuda_compute_ctc_alpha/beta (src/aslp-cudamatrix/cu-kernels.h:502-517,
dispatched from ctc-loss.cc:115 EvalParallel).  The same shift/logsumexp
step as ops/ctc.py's lax.scan, but the carry never leaves VMEM and the
per-step emission block streams in via the grid pipeline.

Because the CTC gradient is a pure function of (alpha, beta, logp)
(the occupancy formula in ops/ctc.py), these kernels slot into the
custom-VJP forward with no Pallas backward needed."""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _shift_r(x, k):
    pad = jnp.full(x.shape[:-1] + (k,), NEG_INF, x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def _shift_l(x, k):
    pad = jnp.full(x.shape[:-1] + (k,), NEG_INF, x.dtype)
    return jnp.concatenate([x[..., k:], pad], axis=-1)


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m = jnp.maximum(m, NEG_INF)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m)
                       + jnp.exp(c - m))


def _alpha_kernel(lp_ref, active_ref, skip_ref, init_ref, out_ref,
                  alpha_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        alpha_scr[:] = init_ref[:]

    @pl.when(t > 0)
    def _():
        prev = alpha_scr[:]
        cand = _lse3(
            prev, _shift_r(prev, 1),
            jnp.where(skip_ref[:] > 0, _shift_r(prev, 2), NEG_INF),
        ) + lp_ref[0]
        active = active_ref[0][:, 0:1]
        alpha_scr[:] = jnp.where(active > 0, cand, prev)

    out_ref[0] = alpha_scr[:]


def _beta_kernel(lp_ref, before_ref, last_ref, skip2_ref, end_ref,
                 out_ref, beta_scr):
    t = pl.program_id(0)  # reversed time via index maps

    @pl.when(t == 0)
    def _():
        beta_scr[:] = jnp.full_like(beta_scr, NEG_INF)

    prev = beta_scr[:]
    cand = _lse3(
        prev, _shift_l(prev, 1),
        jnp.where(skip2_ref[:] > 0, _shift_l(prev, 2), NEG_INF),
    ) + lp_ref[0]
    init = jnp.where(end_ref[:] > 0, lp_ref[0], NEG_INF)
    is_last = last_ref[0][:, 0:1]
    before = before_ref[0][:, 0:1]
    beta_scr[:] = jnp.where(
        is_last > 0, init, jnp.where(before > 0, cand, prev)
    )
    out_ref[0] = beta_scr[:]


def _round_up(n, m):
    return ((n + m - 1) // m) * m


@partial(jax.jit, static_argnames=("interpret",))
def ctc_alpha_beta_pallas(
    lp_t: jnp.ndarray,          # [T, S, U'] emission scores (-inf masked)
    skip_ok: jnp.ndarray,       # [S, U'] skip-transition mask
    input_lengths: jnp.ndarray,  # [S]
    exp_lens: jnp.ndarray,      # [S] expanded label lengths (2U+1)
    interpret: bool = False,
):
    """Returns (alphas [T, S, U'], betas [T, S, U'])."""
    T, S, Up = lp_t.shape
    Up_pad = _round_up(Up, 128)
    S_pad = _round_up(S, 8)
    pad_u = Up_pad - Up
    pad_s = S_pad - S
    if pad_u or pad_s:
        lp_t = jnp.pad(lp_t, ((0, 0), (0, pad_s), (0, pad_u)),
                       constant_values=NEG_INF)
        skip_ok = jnp.pad(skip_ok, ((0, pad_s), (0, pad_u)))
        input_lengths = jnp.pad(input_lengths, (0, pad_s))
        exp_lens = jnp.pad(exp_lens, (0, pad_s), constant_values=1)

    u_idx = jnp.arange(Up_pad)[None, :]
    t_idx = jnp.arange(T)[:, None]
    active = (t_idx < input_lengths[None, :]).astype(jnp.float32)
    is_last = (t_idx == input_lengths[None, :] - 1).astype(jnp.float32)
    before_last = (t_idx < input_lengths[None, :] - 1).astype(jnp.float32)
    active_l = jnp.broadcast_to(active[:, :, None], (T, S_pad, 128))
    last_l = jnp.broadcast_to(is_last[:, :, None], (T, S_pad, 128))
    before_l = jnp.broadcast_to(before_last[:, :, None],
                                (T, S_pad, 128))
    end_mask = ((u_idx == exp_lens[:, None] - 1)
                | (u_idx == exp_lens[:, None] - 2)).astype(jnp.float32)
    # beta's skip uses skip_ok shifted left by 2 (destination-side test)
    skip2 = jnp.pad(skip_ok[:, 2:], ((0, 0), (0, 2)))

    # alpha init = lp[0] restricted to u ∈ {0, 1}
    init = jnp.where(u_idx < 2, lp_t[0], NEG_INF)
    init = jnp.where(
        (u_idx == 1) & (exp_lens[:, None] < 2), NEG_INF, init
    )

    common = dict(
        out_shape=jax.ShapeDtypeStruct((T, S_pad, Up_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S_pad, Up_pad), jnp.float32)],
        interpret=interpret,
    )
    blk = lambda im: pl.BlockSpec((1, S_pad, Up_pad), im,
                                  memory_space=pltpu.VMEM)
    blk_l = lambda im: pl.BlockSpec((1, S_pad, 128), im,
                                    memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)

    alphas = pl.pallas_call(
        _alpha_kernel,
        grid=(T,),
        in_specs=[
            blk(lambda t: (t, 0, 0)),
            blk_l(lambda t: (t, 0, 0)),
            full((S_pad, Up_pad)),
            full((S_pad, Up_pad)),
        ],
        out_specs=blk(lambda t: (t, 0, 0)),
        **common,
    )(lp_t, active_l, skip_ok, init)

    rev = lambda t: (T - 1 - t, 0, 0)
    betas = pl.pallas_call(
        _beta_kernel,
        grid=(T,),
        in_specs=[
            blk(rev),
            blk_l(rev),
            blk_l(rev),
            full((S_pad, Up_pad)),
            full((S_pad, Up_pad)),
        ],
        out_specs=blk(rev),
        **common,
    )(lp_t, before_l, last_l, skip2, end_mask)

    return alphas[:, :S, :Up], betas[:, :S, :Up]
