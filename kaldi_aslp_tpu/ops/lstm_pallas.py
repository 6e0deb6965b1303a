"""Pallas LSTMP sequence kernel: the recurrent hot loop in VMEM.

The lax.scan LSTM step is HBM-bandwidth-bound: every timestep re-streams
the recurrent weights (w_gifo_r ~1.3-2.6MB + projection) from HBM
(measured ~11µs/step vs ~4.5µs bandwidth bound for S=128,C=512,P=320).
This kernel runs the WHOLE time loop as a sequential Pallas grid with
the weights, peepholes and carried state pinned in VMEM — per step only
the precomputed input projection block streams in and the projected
output streams out.

Replaces (reference): the per-timestep CUDA kernel launches of
src/aslp-nnet/nnet-lstm-projected-streams.h:347-432.

Two entry points:
  - ``lstmp_forward_pallas`` — inference kernel (no stored activations);
  - ``lstmp_train_core`` — custom-VJP pair: a forward kernel that also
    stores post-activation gates and the state sequences, and a
    reverse-grid backward kernel that keeps the recurrent weights AND
    the weight-gradient accumulators VMEM-resident (the training
    equivalent of the reference's hot loop,
    nnet-lstm-projected-streams.h:434-575 BackpropagateFnc)."""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# forward-kernel scheduling experiments (read once at import; the MFU
# probe sets these per process): "bf16" = evaluate gate activations at
# bf16, "interleave" = issue both directions' gate matmuls before
# either VPU chain, "both" = both.
_FWD_VARIANT = os.environ.get("KALDI_LSTMP_FWD_VARIANT", "")
_FWD_GATES_BF16 = _FWD_VARIANT in ("bf16", "both")
_FWD_INTERLEAVE = _FWD_VARIANT in ("interleave", "both")


def _lstmp_kernel(cell_clip: float,
                  xg_ref, mask_ref, w_r_ref, w_rm_ref, peep_ref,
                  init_c_ref, init_r_ref,
                  ys_ref, final_c_ref, final_r_ref,
                  c_scr, r_scr):
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        c_scr[:] = init_c_ref[:]
        r_scr[:] = init_r_ref[:]

    C = c_scr.shape[1]
    c_prev = c_scr[:]
    r_prev = r_scr[:]
    gates = xg_ref[0] + jnp.dot(
        r_prev, w_r_ref[:], preferred_element_type=jnp.float32
    )
    g = jnp.tanh(gates[:, :C])
    i = jax.nn.sigmoid(gates[:, C:2 * C] + peep_ref[0] * c_prev)
    f = jax.nn.sigmoid(gates[:, 2 * C:3 * C] + peep_ref[1] * c_prev)
    c = f * c_prev + i * g
    if cell_clip > 0:
        c = jnp.clip(c, -cell_clip, cell_clip)
    o = jax.nn.sigmoid(gates[:, 3 * C:] + peep_ref[2] * c)
    m = o * jnp.tanh(c)
    r = jnp.dot(m, w_rm_ref[:], preferred_element_type=jnp.float32)
    mask_t = mask_ref[0][:, 0:1]  # [S, 1] from the lane-replicated mask
    c_scr[:] = mask_t * c + (1.0 - mask_t) * c_prev
    r_scr[:] = mask_t * r + (1.0 - mask_t) * r_prev
    ys_ref[0] = r_scr[:] * mask_t

    @pl.when(t == T - 1)
    def _():
        final_c_ref[:] = c_scr[:]
        final_r_ref[:] = r_scr[:]


@partial(jax.jit, static_argnames=("cell_clip", "interpret"))
def lstmp_forward_pallas(
    xg: jnp.ndarray,        # [S, T, 4C] input projection (+bias)
    mask: jnp.ndarray,      # [S, T]
    w_gifo_r: jnp.ndarray,  # [4C, P]
    w_r_m: jnp.ndarray,     # [P, C]
    peepholes: jnp.ndarray,  # [3, C] (i, f, o)
    init_c: jnp.ndarray,    # [S, C]
    init_r: jnp.ndarray,    # [S, P]
    cell_clip: float = 50.0,
    interpret: bool = False,
):
    """Returns (ys [S, T, P], final_c, final_r)."""
    S, T, G = xg.shape
    C = G // 4
    P = w_r_m.shape[0]
    xg_t = jnp.swapaxes(xg, 0, 1)      # [T, S, 4C]
    # lane-replicate the mask so its block meets the (8, 128) tiling rule
    mask_t = jnp.broadcast_to(
        jnp.swapaxes(mask, 0, 1)[:, :, None], (T, S, 128)
    )

    in_specs = [
            pl.BlockSpec((1, S, G), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, G), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, P), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, C), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, P), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
    ]
    out_specs = [
            pl.BlockSpec((1, S, P), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, C), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, P), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
    ]
    ys, final_c, final_r = pl.pallas_call(
        partial(_lstmp_kernel, cell_clip),
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((T, S, P), jnp.float32),
            jax.ShapeDtypeStruct((S, C), jnp.float32),
            jax.ShapeDtypeStruct((S, P), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, C), jnp.float32),
            pltpu.VMEM((S, P), jnp.float32),
        ],
        interpret=interpret,
    )(
        xg_t, mask_t,
        jnp.swapaxes(w_gifo_r, 0, 1),  # [P, 4C] for r @ w
        jnp.swapaxes(w_r_m, 0, 1),     # [C, P] for m @ w
        peepholes, init_c, init_r,
    )
    return jnp.swapaxes(ys, 0, 1), final_c, final_r


def lstmp_forward_pallas_from_params(params, x, mask=None, state=None,
                                     cell_clip: float = 50.0):
    """Convenience wrapper matching LstmProjectedStreams.apply inputs."""
    S, T, _ = x.shape
    C = params["w_gifo_x"].shape[0] // 4
    P = params["w_r_m"].shape[0]
    if mask is None:
        mask = jnp.ones((S, T), jnp.float32)
    if state is None:
        state = {"c": jnp.zeros((S, C), jnp.float32),
                 "r": jnp.zeros((S, P), jnp.float32)}
    xg = jnp.einsum("std,gd->stg", x, params["w_gifo_x"],
                    preferred_element_type=jnp.float32) + params["bias"]
    peep = jnp.stack([params["peephole_i_c"], params["peephole_f_c"],
                      params["peephole_o_c"]])
    interpret = jax.default_backend() == "cpu"
    ys, c, r = lstmp_forward_pallas(
        xg, mask, params["w_gifo_r"], params["w_r_m"], peep,
        state["c"], state["r"], cell_clip=cell_clip,
        interpret=interpret,
    )
    return ys, {"c": c, "r": r}


# ---------------------------------------------------------------------------
# training: custom-VJP core with Pallas forward + backward
# ---------------------------------------------------------------------------
#
# Grid is (num_stream_blocks, T): the stream axis is tiled in blocks of
# <=128 so VMEM stays bounded for any batch size; time is the inner
# (fastest) grid dimension, so each stream block runs its whole
# sequential recurrence with weights and carried state resident before
# the next block starts.

S_BLK = 128


def _mm_k(a, b, mxu_bf16: bool):
    """Kernel matmul; optionally bf16 operands with f32 accumulation
    (2x MXU throughput at ~1e-2 relative gradient noise)."""
    if mxu_bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _lstmp_fwd_train_kernel(cell_clip: float, mxu_bf16: bool,
                            xg_ref, mask_ref, w_r_ref, w_rm_ref, peep_ref,
                            init_c_ref, init_r_ref,
                            gates_ref, cs_ref, rs_ref,
                            c_scr, r_scr):
    """Forward storing post-activation gates + post-mask states."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        c_scr[:] = init_c_ref[:]
        r_scr[:] = init_r_ref[:]

    C = c_scr.shape[1]
    c_prev = c_scr[:]
    r_prev = r_scr[:]
    gates = xg_ref[0].astype(jnp.float32) \
        + _mm_k(r_prev, w_r_ref[:], mxu_bf16)
    gt = jnp.tanh(gates[:, :C])
    i = jax.nn.sigmoid(gates[:, C:2 * C] + peep_ref[0] * c_prev)
    f = jax.nn.sigmoid(gates[:, 2 * C:3 * C] + peep_ref[1] * c_prev)
    c = f * c_prev + i * gt
    if cell_clip > 0:
        c = jnp.clip(c, -cell_clip, cell_clip)
    o = jax.nn.sigmoid(gates[:, 3 * C:] + peep_ref[2] * c)
    m = o * jnp.tanh(c)
    r = _mm_k(m, w_rm_ref[:], mxu_bf16)
    mask_t = mask_ref[0][:, 0:1]
    c_scr[:] = mask_t * c + (1.0 - mask_t) * c_prev
    r_scr[:] = mask_t * r + (1.0 - mask_t) * r_prev
    gates_ref[0] = jnp.concatenate([gt, i, f, o],
                                   axis=1).astype(gates_ref.dtype)
    cs_ref[0] = c_scr[:].astype(cs_ref.dtype)
    rs_ref[0] = r_scr[:].astype(rs_ref.dtype)


def _lstmp_bwd_kernel(cell_clip: float, mxu_bf16: bool,
                      dy_ref, mask_ref, gates_ref, cp_ref, rp_ref,
                      w_r_ref, w_rm_ref, peep_ref, dfc_ref, dfr_ref,
                      dxg_ref, dic_ref, dir_ref, drnew_ref,
                      dc_scr, dr_scr):
    """Reverse-time backward; grid step (s, p) processes stream block s
    at frame T-1-p.

    The backward state carry is seeded per stream block with the
    final-state cotangents (the carries into frame T-1 ARE
    d(final_c)/d(final_r)).  Weight gradients are NOT accumulated here:
    the kernel emits dgates (dxg) and dr_new per step, and the wrapper
    reduces them against the stored activation sequences as big MXU
    einsums over T*S — the serial chain only carries the two state
    matmuls, halving per-step MXU work, and the [P,4C]/[C,P] f32
    accumulators leave VMEM (headroom the fused bidirectional kernel
    needs)."""
    p = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(p == 0)
    def _():
        dc_scr[:] = dfc_ref[:]
        dr_scr[:] = dfr_ref[:]

    C = dc_scr.shape[1]
    gates = gates_ref[0].astype(jnp.float32)
    gt = gates[:, :C]
    i = gates[:, C:2 * C]
    f = gates[:, 2 * C:3 * C]
    o = gates[:, 3 * C:]
    c_prev = cp_ref[0].astype(jnp.float32)
    r_prev = rp_ref[0].astype(jnp.float32)
    del r_prev  # only needed by the hoisted dwr einsum outside
    mask_t = mask_ref[0][:, 0:1]

    cu = f * c_prev + i * gt
    c = jnp.clip(cu, -cell_clip, cell_clip) if cell_clip > 0 else cu
    tanh_c = jnp.tanh(c)

    dR_after = dy_ref[0] * mask_t + dr_scr[:]
    dr_new = mask_t * dR_after
    dr_prev = (1.0 - mask_t) * dR_after
    dC_after = dc_scr[:]
    dc_new = mask_t * dC_after
    dc_prev_skip = (1.0 - mask_t) * dC_after

    # r = m @ w_rm  (w_rm_ref: [C, P])
    dm = _mm_k(dr_new, w_rm_ref[:].T, mxu_bf16)
    do = dm * tanh_c
    dc = dc_new + dm * o * (1.0 - tanh_c * tanh_c)
    do_lin = do * o * (1.0 - o)
    dc = dc + do_lin * peep_ref[2]
    if cell_clip > 0:
        dcu = dc * (jnp.abs(cu) < cell_clip).astype(jnp.float32)
    else:
        dcu = dc
    di = dcu * gt
    dg = dcu * i
    df = dcu * c_prev
    di_lin = di * i * (1.0 - i)
    df_lin = df * f * (1.0 - f)
    dg_lin = dg * (1.0 - gt * gt)
    dc_prev = dcu * f + di_lin * peep_ref[0] + df_lin * peep_ref[1] \
        + dc_prev_skip
    dgates = jnp.concatenate([dg_lin, di_lin, df_lin, do_lin], axis=1)
    dxg_ref[0] = dgates.astype(dxg_ref.dtype)
    drnew_ref[0] = dr_new.astype(drnew_ref.dtype)
    # gates = xg + r_prev @ w_r  (w_r_ref: [P, 4C])
    dr_prev = dr_prev + _mm_k(dgates, w_r_ref[:].T, mxu_bf16)
    dc_scr[:] = dc_prev
    dr_scr[:] = dr_prev

    @pl.when(p == T - 1)
    def _():
        dic_ref[:] = dc_scr[:]
        dir_ref[:] = dr_scr[:]


def _resident2(shape):
    return pl.BlockSpec(shape, lambda s, t: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _per_block(shape):
    """[S_total, X] array tiled along streams only."""
    return pl.BlockSpec(shape, lambda s, t: (s, 0),
                        memory_space=pltpu.VMEM)


def _stepped2(shape):
    return pl.BlockSpec((1,) + shape, lambda s, t: (t, s, 0),
                        memory_space=pltpu.VMEM)


def _stepped2_rev(shape, T):
    return pl.BlockSpec((1,) + shape, lambda s, t: (T - 1 - t, s, 0),
                        memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("cell_clip", "interpret",
                                   "store_bf16", "mxu_bf16"))
def _lstmp_train_fwd(xg, mask, w_r_t, w_rm_t, peep, init_c, init_r,
                     cell_clip, interpret, store_bf16=False,
                     mxu_bf16=False):
    S, T, G = xg.shape
    C = G // 4
    P = w_r_t.shape[0]
    blk = min(S, S_BLK)
    assert S % blk == 0
    nS = S // blk
    act_dt = jnp.bfloat16 if store_bf16 else jnp.float32
    xg_t = jnp.swapaxes(xg, 0, 1).astype(act_dt)
    mask_t = jnp.broadcast_to(
        jnp.swapaxes(mask, 0, 1)[:, :, None], (T, S, 128))
    gates, cs, rs = pl.pallas_call(
        partial(_lstmp_fwd_train_kernel, cell_clip, mxu_bf16),
        grid=(nS, T),
        in_specs=[
            _stepped2((blk, G)), _stepped2((blk, 128)),
            _resident2((P, G)), _resident2((C, P)), _resident2((3, C)),
            _per_block((blk, C)), _per_block((blk, P)),
        ],
        out_specs=[
            _stepped2((blk, G)), _stepped2((blk, C)),
            _stepped2((blk, P)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (T, S, G),
                jnp.bfloat16 if store_bf16 else jnp.float32),
            jax.ShapeDtypeStruct(
                (T, S, C),
                jnp.bfloat16 if store_bf16 else jnp.float32),
            jax.ShapeDtypeStruct(
                (T, S, P),
                jnp.bfloat16 if store_bf16 else jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, C), jnp.float32),
            pltpu.VMEM((blk, P), jnp.float32),
        ],
        interpret=interpret,
    )(xg_t, mask_t, w_r_t, w_rm_t, peep, init_c, init_r)
    return gates, cs, rs


@partial(jax.jit, static_argnames=("cell_clip", "interpret",
                                   "mxu_bf16", "store_bf16"))
def _lstmp_train_bwd(dys, mask, gates, cs, c_prev_seq, r_prev_seq,
                     w_r_t, w_rm_t, peep, d_final_c, d_final_r,
                     cell_clip, interpret, mxu_bf16=False,
                     store_bf16=False):
    T, S, G = gates.shape
    C = G // 4
    P = w_r_t.shape[0]
    blk = min(S, S_BLK)
    assert S % blk == 0
    nS = S // blk
    dy_t = jnp.swapaxes(dys, 0, 1)
    mask_t = jnp.broadcast_to(
        jnp.swapaxes(mask, 0, 1)[:, :, None], (T, S, 128))
    act_dt = jnp.bfloat16 if store_bf16 else jnp.float32
    dxg, dic, dir_, drnew = pl.pallas_call(
        partial(_lstmp_bwd_kernel, cell_clip, mxu_bf16),
        grid=(nS, T),
        in_specs=[
            _stepped2_rev((blk, P), T), _stepped2_rev((blk, 128), T),
            _stepped2_rev((blk, G), T), _stepped2_rev((blk, C), T),
            _stepped2_rev((blk, P), T),
            _resident2((P, G)), _resident2((C, P)), _resident2((3, C)),
            _per_block((blk, C)), _per_block((blk, P)),
        ],
        out_specs=[
            _stepped2_rev((blk, G), T),
            _per_block((blk, C)), _per_block((blk, P)),
            _stepped2_rev((blk, P), T),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, S, G), act_dt),
            jax.ShapeDtypeStruct((S, C), jnp.float32),
            jax.ShapeDtypeStruct((S, P), jnp.float32),
            jax.ShapeDtypeStruct((T, S, P), act_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, C), jnp.float32),
            pltpu.VMEM((blk, P), jnp.float32),
        ],
        interpret=interpret,
    )(dy_t, mask_t, gates, c_prev_seq, r_prev_seq, w_r_t, w_rm_t,
      peep, d_final_c, d_final_r)

    # hoisted weight/peephole gradients: one big reduction over T*S
    # each instead of T sequential rank-blk updates inside the kernel
    def mm2(a, b):
        if mxu_bf16:
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
        return jnp.einsum("tsa,tsb->ab", a, b,
                          preferred_element_type=jnp.float32)

    dwr = mm2(r_prev_seq, dxg)                 # [P, 4C]
    gf32 = gates.astype(jnp.float32)
    o_seq = gf32[..., 3 * C:]
    c_seq = cs.astype(jnp.float32)
    m_seq = o_seq * jnp.tanh(c_seq)
    dwrm = mm2(m_seq, drnew)                   # [C, P]
    dxg32 = dxg.astype(jnp.float32)
    cprev32 = c_prev_seq.astype(jnp.float32)
    di_lin = dxg32[..., C:2 * C]
    df_lin = dxg32[..., 2 * C:3 * C]
    do_lin = dxg32[..., 3 * C:]
    dpeep = jnp.stack([
        jnp.sum(di_lin * cprev32, axis=(0, 1)),
        jnp.sum(df_lin * cprev32, axis=(0, 1)),
        jnp.sum(do_lin * c_seq, axis=(0, 1)),
    ])
    return jnp.swapaxes(dxg, 0, 1), dic, dir_, dwr, dwrm, dpeep


import functools


@functools.lru_cache(maxsize=None)
def _get_lstmp_core(cell_clip: float, interpret: bool,
                    store_bf16: bool = False,
                    mxu_bf16: bool = False):
    """Build the custom-VJP LSTMP core for (cell_clip, interpret).

    Signature: core(xg, mask, w_gifo_r [4C,P], w_r_m [P,C], peep [3,C],
    init_c, init_r) → (ys [S,T,P], final_c, final_r).  The input
    projection (x @ W^T + b) stays outside so XLA differentiates it."""

    def _forward(xg, mask, w_gifo_r, w_r_m, peep, init_c, init_r):
        w_r_t = jnp.swapaxes(w_gifo_r, 0, 1)   # [P, 4C]
        w_rm_t = jnp.swapaxes(w_r_m, 0, 1)     # [C, P]
        gates, cs, rs = _lstmp_train_fwd(
            xg, mask, w_r_t, w_rm_t, peep, init_c, init_r,
            cell_clip, interpret, store_bf16, mxu_bf16)
        ys = jnp.swapaxes(rs, 0, 1) \
            * mask[:, :, None].astype(rs.dtype)
        final_c = cs[-1].astype(jnp.float32)
        final_r = rs[-1].astype(jnp.float32)
        return (ys, final_c, final_r), (gates, cs, rs)

    @jax.custom_vjp
    def core(xg, mask, w_gifo_r, w_r_m, peep, init_c, init_r):
        out, _ = _forward(xg, mask, w_gifo_r, w_r_m, peep,
                          init_c, init_r)
        return out

    def fwd(xg, mask, w_gifo_r, w_r_m, peep, init_c, init_r):
        out, (gates, cs, rs) = _forward(
            xg, mask, w_gifo_r, w_r_m, peep, init_c, init_r)
        return out, (mask, gates, cs, rs, w_gifo_r, w_r_m, peep,
                     init_c, init_r)

    def bwd(res, cotangents):
        dys, d_final_c, d_final_r = cotangents
        (mask, gates, cs, rs, w_gifo_r, w_r_m, peep,
         init_c, init_r) = res
        act_dt = gates.dtype
        c_prev_seq = jnp.concatenate(
            [init_c[None].astype(act_dt), cs[:-1]], axis=0)
        r_prev_seq = jnp.concatenate(
            [init_r[None].astype(act_dt), rs[:-1]], axis=0)
        w_r_t = jnp.swapaxes(w_gifo_r, 0, 1)
        w_rm_t = jnp.swapaxes(w_r_m, 0, 1)
        dxg, dic, dir_, dwr, dwrm, dpeep = _lstmp_train_bwd(
            dys, mask, gates, cs, c_prev_seq, r_prev_seq, w_r_t,
            w_rm_t, peep, d_final_c, d_final_r, cell_clip, interpret,
            mxu_bf16, store_bf16)
        d_w_gifo_r = jnp.swapaxes(dwr, 0, 1)   # [4C, P]
        d_w_r_m = jnp.swapaxes(dwrm, 0, 1)     # [P, C]
        return (dxg.astype(jnp.float32), None, d_w_gifo_r, d_w_r_m,
                dpeep, dic, dir_)

    core.defvjp(fwd, bwd)
    return core


def lstmp_train_core(xg, mask, w_gifo_r, w_r_m, peepholes,
                     init_c, init_r, cell_clip: float = 50.0,
                     interpret: bool = False,
                     store_bf16: bool = False,
                     mxu_bf16: bool = False):
    """Differentiable Pallas LSTMP core (see _get_lstmp_core).

    ``store_bf16`` stores the saved gate activations in bfloat16 —
    halves activation memory at ~1e-2 relative gradient noise on the
    gate-derivative terms (the states stay float32).  Batches that are
    not multiples of the 128-stream block are zero-padded."""
    S = xg.shape[0]
    blk = min(S, S_BLK)
    pad = (-S) % blk
    if pad:
        def padS(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        xg, mask = padS(xg), padS(mask)
        init_c, init_r = padS(init_c), padS(init_r)
    core = _get_lstmp_core(float(cell_clip), bool(interpret),
                           bool(store_bf16), bool(mxu_bf16))
    ys, fc, fr = core(xg, mask, w_gifo_r, w_r_m, peepholes,
                      init_c, init_r)
    if pad:
        ys, fc, fr = ys[:S], fc[:S], fr[:S]
    return ys, fc, fr


# ---------------------------------------------------------------------------
# fused bidirectional training core
# ---------------------------------------------------------------------------
#
# A BLSTM layer's two directions are independent dependency chains; run
# as two pallas calls they serialize (each grid step is a small matmul
# followed by VPU elementwise on its result — MXU idles during the
# elementwise and vice versa).  Fusing both directions into ONE kernel
# gives the Mosaic scheduler two interleavable chains per grid step:
# direction f at frame t and direction b at frame T-1-t (its reversed
# traversal), so the MXU can run one direction's matmul while the VPU
# chews the other's gates.  Time reversal is done by BlockSpec index
# maps — no jnp.flip copies of the [T,S,4C] activations at all.
# Requires bf16 activation storage (store_bf16) to fit VMEM at the
# 128-stream block size.


def _bilstmp_fwd_kernel(cell_clip: float, mxu_bf16: bool,
                        xgf_ref, xgb_ref, mf_ref, mb_ref,
                        w_r2_ref, w_rm2_ref, peep2_ref, bias2_ref,
                        init_c_ref, init_r_ref,
                        gf_ref, gb_ref, csf_ref, csb_ref,
                        rsf_ref, rsb_ref, fc_ref, fr_ref,
                        cf_scr, rf_scr, cb_scr, rb_scr):
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        cf_scr[:] = init_c_ref[:]
        rf_scr[:] = init_r_ref[:]
        cb_scr[:] = jnp.zeros_like(cb_scr)
        rb_scr[:] = jnp.zeros_like(rb_scr)

    C = cf_scr.shape[1]

    def step(xg, mask_t, c_prev, r_prev, d):
        gates = xg.astype(jnp.float32) + bias2_ref[d] \
            + _mm_k(r_prev, w_r2_ref[d], mxu_bf16)
        gt = jnp.tanh(gates[:, :C])
        i = jax.nn.sigmoid(gates[:, C:2 * C] + peep2_ref[d, 0] * c_prev)
        f = jax.nn.sigmoid(gates[:, 2 * C:3 * C]
                           + peep2_ref[d, 1] * c_prev)
        c = f * c_prev + i * gt
        if cell_clip > 0:
            c = jnp.clip(c, -cell_clip, cell_clip)
        o = jax.nn.sigmoid(gates[:, 3 * C:] + peep2_ref[d, 2] * c)
        m = o * jnp.tanh(c)
        r = _mm_k(m, w_rm2_ref[d], mxu_bf16)
        c_new = mask_t * c + (1.0 - mask_t) * c_prev
        r_new = mask_t * r + (1.0 - mask_t) * r_prev
        return jnp.concatenate([gt, i, f, o], axis=1), c_new, r_new

    mf = mf_ref[0][:, 0:1]
    mb = mb_ref[0][:, 0:1]
    gatesf, cf, rf = step(xgf_ref[0], mf, cf_scr[:], rf_scr[:], 0)
    gatesb, cb, rb = step(xgb_ref[0], mb, cb_scr[:], rb_scr[:], 1)
    cf_scr[:] = cf
    rf_scr[:] = rf
    cb_scr[:] = cb
    rb_scr[:] = rb
    gf_ref[0] = gatesf.astype(gf_ref.dtype)
    gb_ref[0] = gatesb.astype(gb_ref.dtype)
    csf_ref[0] = cf.astype(csf_ref.dtype)
    csb_ref[0] = cb.astype(csb_ref.dtype)
    rsf_ref[0] = rf.astype(rsf_ref.dtype)
    rsb_ref[0] = rb.astype(rsb_ref.dtype)

    @pl.when(t == T - 1)
    def _():
        fc_ref[:] = cf_scr[:]
        fr_ref[:] = rf_scr[:]


def _bilstmp_bwd_kernel(cell_clip: float, mxu_bf16: bool,
                        dyf_ref, dyb_ref, mf_ref, mb_ref,
                        gf_ref, gb_ref, cpf_ref, cpb_ref,
                        ic_ref,
                        w_r2_ref, w_rm2_ref, peep2_ref,
                        dfc_ref, dfr_ref,
                        dxgf_ref, dxgb_ref, drnf_ref, drnb_ref,
                        msf_ref, msb_ref,
                        dic_ref, dir_ref, dbias2_ref, dpeep2_ref,
                        dcf_scr, drf_scr, dcb_scr, drb_scr,
                        dbias_scr, dpeep_scr):
    sb = pl.program_id(0)
    p = pl.program_id(1)
    nS = pl.num_programs(0)
    T = pl.num_programs(1)

    @pl.when((sb == 0) & (p == 0))
    def _():
        dbias_scr[:] = jnp.zeros_like(dbias_scr)
        dpeep_scr[:] = jnp.zeros_like(dpeep_scr)

    @pl.when(p == 0)
    def _():
        dcf_scr[:] = dfc_ref[:]
        drf_scr[:] = dfr_ref[:]
        dcb_scr[:] = jnp.zeros_like(dcb_scr)
        drb_scr[:] = jnp.zeros_like(drb_scr)

    C = dcf_scr.shape[1]

    def step(dy, mask_t, gates, c_prev, dc_carry, dr_carry, d):
        gates = gates.astype(jnp.float32)
        gt = gates[:, :C]
        i = gates[:, C:2 * C]
        f = gates[:, 2 * C:3 * C]
        o = gates[:, 3 * C:]
        cu = f * c_prev + i * gt
        c = jnp.clip(cu, -cell_clip, cell_clip) if cell_clip > 0 else cu
        tanh_c = jnp.tanh(c)
        m = o * tanh_c
        dR_after = dy.astype(jnp.float32) * mask_t + dr_carry
        dr_new = mask_t * dR_after
        dr_prev = (1.0 - mask_t) * dR_after
        dc_new = mask_t * dc_carry
        dc_prev_skip = (1.0 - mask_t) * dc_carry
        dm = _mm_k(dr_new, w_rm2_ref[d].T, mxu_bf16)
        do = dm * tanh_c
        dc = dc_new + dm * o * (1.0 - tanh_c * tanh_c)
        do_lin = do * o * (1.0 - o)
        dc = dc + do_lin * peep2_ref[d, 2]
        if cell_clip > 0:
            dcu = dc * (jnp.abs(cu) < cell_clip).astype(jnp.float32)
        else:
            dcu = dc
        di_lin = dcu * gt * i * (1.0 - i)
        df_lin = dcu * c_prev * f * (1.0 - f)
        dg_lin = dcu * i * (1.0 - gt * gt)
        dc_prev = dcu * f + di_lin * peep2_ref[d, 0] \
            + df_lin * peep2_ref[d, 1] + dc_prev_skip
        dgates = jnp.concatenate([dg_lin, di_lin, df_lin, do_lin],
                                 axis=1)
        dr_prev = dr_prev + _mm_k(dgates, w_r2_ref[d].T, mxu_bf16)
        # bias/peephole grads: tiny per-step row reductions, far
        # cheaper in VMEM scratch than as post-hoc passes over the
        # [T,S,*] activation streams (measured ~3.7 ms/layer outside)
        dbias_scr[d, :] += jnp.sum(dgates, axis=0)
        dpeep_scr[d, 0, :] += jnp.sum(di_lin * c_prev, axis=0)
        dpeep_scr[d, 1, :] += jnp.sum(df_lin * c_prev, axis=0)
        dpeep_scr[d, 2, :] += jnp.sum(do_lin * c, axis=0)
        return dgates, dr_new, m, dc_prev, dr_prev

    mf = mf_ref[0][:, 0:1]
    mb = mb_ref[0][:, 0:1]
    # cpf/cpb are the UNSHIFTED forward state outputs read through
    # offset index maps (cs[pf-1] / cs[pb+1]); the boundary grid step
    # (p == T-1 for both directions) substitutes the true initial
    # state: init_c for direction f, zeros for direction b
    at_boundary = p == T - 1
    c_prev_f = jnp.where(at_boundary, ic_ref[:].astype(jnp.float32),
                         cpf_ref[0].astype(jnp.float32))
    c_prev_b = jnp.where(at_boundary, 0.0,
                         cpb_ref[0].astype(jnp.float32))
    dgf, drnf, m_f, dcf, drf = step(
        dyf_ref[0], mf, gf_ref[0], c_prev_f,
        dcf_scr[:], drf_scr[:], 0)
    dgb, drnb, m_b, dcb, drb = step(
        dyb_ref[0], mb, gb_ref[0], c_prev_b,
        dcb_scr[:], drb_scr[:], 1)
    dcf_scr[:] = dcf
    drf_scr[:] = drf
    dcb_scr[:] = dcb
    drb_scr[:] = drb
    dxgf_ref[0] = dgf.astype(dxgf_ref.dtype)
    dxgb_ref[0] = dgb.astype(dxgb_ref.dtype)
    drnf_ref[0] = drnf.astype(drnf_ref.dtype)
    drnb_ref[0] = drnb.astype(drnb_ref.dtype)
    msf_ref[0] = m_f.astype(msf_ref.dtype)
    msb_ref[0] = m_b.astype(msb_ref.dtype)

    @pl.when(p == T - 1)
    def _():
        dic_ref[:] = dcf_scr[:]
        dir_ref[:] = drf_scr[:]

    @pl.when((sb == nS - 1) & (p == T - 1))
    def _():
        dbias2_ref[:] = dbias_scr[:]
        dpeep2_ref[:] = dpeep_scr[:]


def _fwd_idx(shape):
    return pl.BlockSpec((1,) + shape, lambda s, t: (t, s, 0),
                        memory_space=pltpu.VMEM)


def _rev_idx(shape, T):
    return pl.BlockSpec((1,) + shape, lambda s, t: (T - 1 - t, s, 0),
                        memory_space=pltpu.VMEM)


def _rev_prev_idx(shape, T):
    """Reverse-time traversal reading the PREVIOUS frame's block of a
    saved state sequence (frame T-2-t, clamped; the t = T-1 boundary
    block is substituted in-kernel).  Lets the backward read c_{t-1}
    straight out of the forward's cs output — no shifted concat copy
    of the [T,S,C] stream at the autodiff boundary."""
    return pl.BlockSpec((1,) + shape,
                        lambda s, t: (jnp.maximum(T - 2 - t, 0), s, 0),
                        memory_space=pltpu.VMEM)


def _fwd_next_idx(shape, T):
    """Natural-order traversal reading the NEXT frame's block (frame
    t+1, clamped; the t = T-1 boundary is substituted in-kernel) — the
    backward-direction mirror of _rev_prev_idx."""
    return pl.BlockSpec((1,) + shape,
                        lambda s, t: (jnp.minimum(t + 1, T - 1), s, 0),
                        memory_space=pltpu.VMEM)


def _resident3(shape):
    return pl.BlockSpec(shape, lambda s, t: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("cell_clip", "interpret",
                                   "store_bf16", "mxu_bf16"))
def _bilstmp_train_fwd(xgf, xgb, mask, w_r2, w_rm2, peep2, bias2,
                       init_c, init_r, cell_clip, interpret,
                       store_bf16=True, mxu_bf16=True):
    S, T, G = xgf.shape
    C = G // 4
    P = w_r2.shape[1]
    blk = min(S, S_BLK)
    assert S % blk == 0
    nS = S // blk
    act_dt = jnp.bfloat16 if store_bf16 else jnp.float32
    xgf_t = jnp.swapaxes(xgf, 0, 1).astype(act_dt)
    xgb_t = jnp.swapaxes(xgb, 0, 1).astype(act_dt)
    mask_t = jnp.broadcast_to(
        jnp.swapaxes(mask, 0, 1)[:, :, None], (T, S, 128))
    outs = pl.pallas_call(
        partial(_bilstmp_fwd_kernel, cell_clip, mxu_bf16),
        grid=(nS, T),
        in_specs=[
            _fwd_idx((blk, G)), _rev_idx((blk, G), T),
            _fwd_idx((blk, 128)), _rev_idx((blk, 128), T),
            _resident3((2, P, G)), _resident3((2, C, P)),
            _resident3((2, 3, C)), _resident3((2, G)),
            _per_block((blk, C)), _per_block((blk, P)),
        ],
        out_specs=[
            _fwd_idx((blk, G)), _rev_idx((blk, G), T),
            _fwd_idx((blk, C)), _rev_idx((blk, C), T),
            _fwd_idx((blk, P)), _rev_idx((blk, P), T),
            _per_block((blk, C)), _per_block((blk, P)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, S, G), act_dt),
            jax.ShapeDtypeStruct((T, S, G), act_dt),
            jax.ShapeDtypeStruct((T, S, C), act_dt),
            jax.ShapeDtypeStruct((T, S, C), act_dt),
            jax.ShapeDtypeStruct((T, S, P), act_dt),
            jax.ShapeDtypeStruct((T, S, P), act_dt),
            jax.ShapeDtypeStruct((S, C), jnp.float32),
            jax.ShapeDtypeStruct((S, P), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, C), jnp.float32),
            pltpu.VMEM((blk, P), jnp.float32),
            pltpu.VMEM((blk, C), jnp.float32),
            pltpu.VMEM((blk, P), jnp.float32),
        ],
        interpret=interpret,
    )(xgf_t, xgb_t, mask_t, mask_t, w_r2, w_rm2, peep2, bias2,
      init_c, init_r)
    return outs


@partial(jax.jit, static_argnames=("cell_clip", "interpret",
                                   "store_bf16", "mxu_bf16"))
def _bilstmp_train_bwd(dyf, dyb, mask, gf, gb,
                       csf, csb, init_c, rpf, rpb, w_r2, w_rm2, peep2,
                       d_final_c, d_final_r, cell_clip, interpret,
                       store_bf16=True, mxu_bf16=True):
    T, S, G = gf.shape
    C = G // 4
    P = w_r2.shape[1]
    blk = min(S, S_BLK)
    nS = S // blk
    act_dt = jnp.bfloat16 if store_bf16 else jnp.float32
    dyf_t = jnp.swapaxes(dyf, 0, 1).astype(act_dt)
    dyb_t = jnp.swapaxes(dyb, 0, 1).astype(act_dt)
    mask_t = jnp.broadcast_to(
        jnp.swapaxes(mask, 0, 1)[:, :, None], (T, S, 128))
    (dxgf, dxgb, drnf, drnb, msf, msb, dic, dir_, dbias2,
     dpeep2) = pl.pallas_call(
        partial(_bilstmp_bwd_kernel, cell_clip, mxu_bf16),
        grid=(nS, T),
        in_specs=[
            _rev_idx((blk, P), T), _fwd_idx((blk, P)),
            _rev_idx((blk, 128), T), _fwd_idx((blk, 128)),
            _rev_idx((blk, G), T), _fwd_idx((blk, G)),
            _rev_prev_idx((blk, C), T), _fwd_next_idx((blk, C), T),
            _per_block((blk, C)),
            _resident3((2, P, G)), _resident3((2, C, P)),
            _resident3((2, 3, C)),
            _per_block((blk, C)), _per_block((blk, P)),
        ],
        out_specs=[
            _rev_idx((blk, G), T), _fwd_idx((blk, G)),
            _rev_idx((blk, P), T), _fwd_idx((blk, P)),
            _rev_idx((blk, C), T), _fwd_idx((blk, C)),
            _per_block((blk, C)), _per_block((blk, P)),
            _resident3((2, G)), _resident3((2, 3, C)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, S, G), act_dt),
            jax.ShapeDtypeStruct((T, S, G), act_dt),
            jax.ShapeDtypeStruct((T, S, P), act_dt),
            jax.ShapeDtypeStruct((T, S, P), act_dt),
            jax.ShapeDtypeStruct((T, S, C), act_dt),
            jax.ShapeDtypeStruct((T, S, C), act_dt),
            jax.ShapeDtypeStruct((S, C), jnp.float32),
            jax.ShapeDtypeStruct((S, P), jnp.float32),
            jax.ShapeDtypeStruct((2, G), jnp.float32),
            jax.ShapeDtypeStruct((2, 3, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, C), jnp.float32),
            pltpu.VMEM((blk, P), jnp.float32),
            pltpu.VMEM((blk, C), jnp.float32),
            pltpu.VMEM((blk, P), jnp.float32),
            pltpu.VMEM((2, G), jnp.float32),
            pltpu.VMEM((2, 3, C), jnp.float32),
        ],
        interpret=interpret,
    )(dyf_t, dyb_t, mask_t, mask_t, gf, gb, csf, csb, init_c,
      w_r2, w_rm2, peep2, d_final_c, d_final_r)

    # the only remaining off-kernel reductions: two clean bf16 MXU
    # einsums per direction over the emitted streams
    def mm2(a, b):
        if mxu_bf16:
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
        return jnp.einsum("tsa,tsb->ab", a, b,
                          preferred_element_type=jnp.float32)

    dwrf = mm2(rpf, dxgf)                       # [P, 4C]
    dwrb = mm2(rpb, dxgb)
    dwrmf = mm2(msf, drnf)                      # [C, P]
    dwrmb = mm2(msb, drnb)
    return (jnp.swapaxes(dxgf, 0, 1), jnp.swapaxes(dxgb, 0, 1),
            dic, dir_,
            jnp.stack([dwrf, dwrb]), jnp.stack([dwrmf, dwrmb]),
            dpeep2, dbias2)


@functools.lru_cache(maxsize=None)
def _get_bilstmp_core(cell_clip: float, interpret: bool,
                      store_bf16: bool = True, mxu_bf16: bool = True):
    """Custom-VJP fused bidirectional LSTMP core.

    core(xgf, xgb, mask, w_r2 [2,P,4C], w_rm2 [2,C,P], peep2 [2,3,C],
    bias2 [2,4C], init_c, init_r) →
    (ysf [S,T,P], ysb [S,T,P], final_c, final_r); direction b always
    starts from zero state (see _Bidirectional.init_state).  Bias is
    added INSIDE the kernel and its gradient accumulated there, so the
    xg inputs/cotangents can stay bf16 end-to-end (no f32 [S,T,4C]
    materializations at the autodiff boundary)."""

    def _forward(xgf, xgb, mask, w_r2, w_rm2, peep2, bias2,
                 init_c, init_r):
        (gatesf, gatesb, csf, csb, rsf, rsb, fc, fr) = \
            _bilstmp_train_fwd(
                xgf, xgb, mask, w_r2, w_rm2, peep2, bias2,
                init_c, init_r,
                cell_clip, interpret, store_bf16, mxu_bf16)
        mask_e = mask[:, :, None].astype(rsf.dtype)
        ysf = jnp.swapaxes(rsf, 0, 1) * mask_e
        ysb = jnp.swapaxes(rsb, 0, 1) * mask_e
        res = (mask, gatesf, gatesb, csf, csb, rsf, rsb,
               w_r2, w_rm2, peep2, init_c, init_r)
        return (ysf, ysb, fc, fr), res

    @jax.custom_vjp
    def core(xgf, xgb, mask, w_r2, w_rm2, peep2, bias2,
             init_c, init_r):
        out, _ = _forward(xgf, xgb, mask, w_r2, w_rm2, peep2, bias2,
                          init_c, init_r)
        return out

    def fwd(xgf, xgb, mask, w_r2, w_rm2, peep2, bias2,
            init_c, init_r):
        return _forward(xgf, xgb, mask, w_r2, w_rm2, peep2, bias2,
                        init_c, init_r)

    def bwd(res, cots):
        dysf, dysb, d_final_c, d_final_r = cots
        (mask, gatesf, gatesb, csf, csb, rsf, rsb,
         w_r2, w_rm2, peep2, init_c, init_r) = res
        act_dt = gatesf.dtype
        # c_{t-1} streams are read straight from csf/csb through
        # offset BlockSpec index maps (no shifted copies); the r_prev
        # streams are still materialized — they feed the hoisted dwr
        # einsums, not the kernel.
        # direction f: prev state at frame t is state after t-1
        rpf = jnp.concatenate(
            [init_r[None].astype(act_dt), rsf[:-1]], axis=0)
        # direction b walks T-1→0: prev state at frame t is state
        # after frame t+1 (zero-init at t = T-1)
        zr = jnp.zeros_like(rsb[:1])
        rpb = jnp.concatenate([rsb[1:], zr], axis=0)
        (dxgf, dxgb, dic, dir_, dwr2, dwrm2, dpeep2, dbias2) = \
            _bilstmp_train_bwd(
                dysf, dysb, mask, gatesf, gatesb,
                csf, csb, init_c, rpf, rpb, w_r2, w_rm2, peep2,
                d_final_c, d_final_r, cell_clip, interpret,
                store_bf16, mxu_bf16)
        act = jnp.bfloat16 if store_bf16 else jnp.float32
        return (dxgf.astype(act), dxgb.astype(act),
                None, dwr2, dwrm2, dpeep2, dbias2, dic, dir_)

    core.defvjp(fwd, bwd)
    return core


def bilstmp_train_core(xgf, xgb, mask, wf_gifo_r, wf_r_m, peep_f,
                       wb_gifo_r, wb_r_m, peep_b, bias_f, bias_b,
                       init_c, init_r,
                       cell_clip: float = 50.0, interpret: bool = False,
                       store_bf16: bool = True, mxu_bf16: bool = True):
    """Fused bidirectional LSTMP training core.

    xgf/xgb are the BIAS-FREE input projections (bias is added inside
    the kernel); pass them in bfloat16 to keep the whole activation
    stream, cotangents included, at half width.  Returns
    (ysf, ysb [S,T,P], final_c, final_r) — direction b output already
    in natural time order (equals flip(cell(flip(x))))."""
    S = xgf.shape[0]
    blk = min(S, S_BLK)
    pad = (-S) % blk
    # primal xg dtype is pinned by store_bf16 so the custom-VJP
    # cotangent dtype is deterministic
    act_dt = jnp.bfloat16 if store_bf16 else jnp.float32
    xgf = xgf.astype(act_dt)
    xgb = xgb.astype(act_dt)
    if pad:
        def padS(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        xgf, xgb, mask = padS(xgf), padS(xgb), padS(mask)
        init_c, init_r = padS(init_c), padS(init_r)
    core = _get_bilstmp_core(float(cell_clip), bool(interpret),
                             bool(store_bf16), bool(mxu_bf16))
    w_r2 = jnp.stack([jnp.swapaxes(wf_gifo_r, 0, 1),
                      jnp.swapaxes(wb_gifo_r, 0, 1)])   # [2, P, 4C]
    w_rm2 = jnp.stack([jnp.swapaxes(wf_r_m, 0, 1),
                       jnp.swapaxes(wb_r_m, 0, 1)])     # [2, C, P]
    peep2 = jnp.stack([peep_f, peep_b])
    bias2 = jnp.stack([bias_f, bias_b])

    ysf, ysb, fc, fr = core(xgf, xgb, mask, w_r2, w_rm2, peep2,
                            bias2, init_c, init_r)
    if pad:
        ysf, ysb, fc, fr = ysf[:S], ysb[:S], fc[:S], fr[:S]
    return ysf, ysb, fc, fr


# ---------------------------------------------------------------------------
# x-fused bidirectional core: the input projection inside the kernel
# ---------------------------------------------------------------------------
#
# The xg-fed core above leaves three [T, S, 4C] HBM streams on the
# table: xg written+read around the forward kernel, and dxg written by
# the backward kernel then re-read by the dwx and dx einsums.  At the
# flagship shape (S=128, T=400, C=512, D=640) that is ~1.5 ms/layer of
# pure gate-width traffic (measured round 2; the round-2 verdict's MFU
# item).  This variant streams x itself (D lanes instead of 4C) and
# keeps w_gifo_x in VMEM:
#
#   forward  — one fused kernel, both directions: gates = bias +
#              x @ w_x + r_prev @ w_r computed in-kernel; xg never
#              exists in HBM.
#   backward — one kernel PER DIRECTION (the f32 [D, 4C] dwx
#              accumulator + bf16 weights of a single direction fit
#              VMEM; two directions' would not): consumes dy/gates/
#              cs/rs/x streams, emits ONLY dx — dwx, dwr, dwrm, dbias,
#              dpeep all accumulate in VMEM scratch across the whole
#              grid, so no [T, S, 4C] cotangent stream and no
#              [T, S, P/C] ms/drn streams exist at all.
#
# Weights ride at rest in bf16 (identical numerics to the mxu_bf16
# cast-per-step path, half the VMEM).  Usable when D is lane-aligned
# (D % 128 == 0); layer 1 of the flagship (D = 40) stays on the xg
# path, where the input einsum is 6% of the layer's FLOPs anyway.


def _bixfused_fwd_kernel(cell_clip: float,
                         xf_ref, xb_ref, mf_ref, mb_ref,
                         w_xr2_ref, w_rm2_ref,
                         peep2_ref, bias2_ref,
                         init_c_ref, init_r_ref,
                         gf_ref, gb_ref, csf_ref, csb_ref,
                         rsf_ref, rsb_ref, fc_ref, fr_ref,
                         cf_scr, rf_scr, cb_scr, rb_scr):
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        cf_scr[:] = init_c_ref[:]
        rf_scr[:] = init_r_ref[:]
        cb_scr[:] = jnp.zeros_like(cb_scr)
        rb_scr[:] = jnp.zeros_like(rb_scr)

    C = cf_scr.shape[1]

    def gates_mm(x, r_prev, d):
        # ONE gate matmul over the concatenated [x | r_prev]
        # contraction (w_xr = [w_x; w_r] stacked by the wrapper): per
        # recurrent step the MXU sees a single [blk, D+P] x [D+P, 4C]
        # product instead of two back-to-back ones — the forward pass
        # is dependency-serial per step, so dispatch/pipeline overhead
        # per matmul is on the critical path (measured round 4: fwd
        # kernel at 48.8% MFU vs backward at 72.6%)
        xr = jnp.concatenate([x, r_prev.astype(x.dtype)], axis=1)
        return bias2_ref[d] + _mm_k(xr, w_xr2_ref[d], True)

    def vpu_chain(gates, c_prev, d):
        if _FWD_GATES_BF16:
            # gate activations evaluated at bf16 — the forward's floor
            # is the dependency-serial VPU transcendental chain, and
            # packed-bf16 VPU math runs 2x (round-4 verdict item 4);
            # the cell-state CARRY stays f32 (it accumulates over T).
            # sigmoid is spelled out with dtype-exact constants:
            # jax.nn.sigmoid's f32 weak-typed 1.0 trips a Mosaic
            # verification error (f32 scalar broadcast into a bf16
            # vector) when the input is bf16
            one = jnp.ones((), jnp.bfloat16)

            def sigb(x):
                return one / (one + jnp.exp(-x))

            gb = gates.astype(jnp.bfloat16)
            cb16 = c_prev.astype(jnp.bfloat16)
            gt = jnp.tanh(gb[:, :C])
            i = sigb(gb[:, C:2 * C]
                     + peep2_ref[d, 0].astype(jnp.bfloat16) * cb16)
            f = sigb(gb[:, 2 * C:3 * C]
                     + peep2_ref[d, 1].astype(jnp.bfloat16) * cb16)
            c = f.astype(jnp.float32) * c_prev \
                + (i * gt).astype(jnp.float32)
            if cell_clip > 0:
                c = jnp.clip(c, -cell_clip, cell_clip)
            o = sigb(gb[:, 3 * C:]
                     + (peep2_ref[d, 2] * c).astype(jnp.bfloat16))
            m = o * jnp.tanh(c.astype(jnp.bfloat16))
            gt = gt.astype(jnp.float32)
            i = i.astype(jnp.float32)
            f = f.astype(jnp.float32)
            o = o.astype(jnp.float32)
        else:
            gt = jnp.tanh(gates[:, :C])
            i = jax.nn.sigmoid(gates[:, C:2 * C]
                               + peep2_ref[d, 0] * c_prev)
            f = jax.nn.sigmoid(gates[:, 2 * C:3 * C]
                               + peep2_ref[d, 1] * c_prev)
            c = f * c_prev + i * gt
            if cell_clip > 0:
                c = jnp.clip(c, -cell_clip, cell_clip)
            o = jax.nn.sigmoid(gates[:, 3 * C:] + peep2_ref[d, 2] * c)
            m = o * jnp.tanh(c)
        return jnp.concatenate([gt, i, f, o], axis=1), c, m

    def finish(gates_lin, mask_t, c_prev, r_prev, d):
        acts, c, m = vpu_chain(gates_lin, c_prev, d)
        r = _mm_k(m, w_rm2_ref[d], True)
        c_new = mask_t * c + (1.0 - mask_t) * c_prev
        r_new = mask_t * r + (1.0 - mask_t) * r_prev
        return acts, c_new, r_new

    mf = mf_ref[0][:, 0:1]
    mb = mb_ref[0][:, 0:1]
    if _FWD_INTERLEAVE:
        # issue BOTH directions' gate matmuls before either VPU chain:
        # the directions are data-independent within a grid step, so
        # direction b's MXU work can hide direction f's serial VPU
        # transcendental chain (round-4 verdict item 4)
        gmf = gates_mm(xf_ref[0], rf_scr[:], 0)
        gmb = gates_mm(xb_ref[0], rb_scr[:], 1)
        gatesf, cf, rf = finish(gmf, mf, cf_scr[:], rf_scr[:], 0)
        gatesb, cb, rb = finish(gmb, mb, cb_scr[:], rb_scr[:], 1)
    else:
        gatesf, cf, rf = finish(gates_mm(xf_ref[0], rf_scr[:], 0),
                                mf, cf_scr[:], rf_scr[:], 0)
        gatesb, cb, rb = finish(gates_mm(xb_ref[0], rb_scr[:], 1),
                                mb, cb_scr[:], rb_scr[:], 1)
    cf_scr[:] = cf
    rf_scr[:] = rf
    cb_scr[:] = cb
    rb_scr[:] = rb
    gf_ref[0] = gatesf.astype(gf_ref.dtype)
    gb_ref[0] = gatesb.astype(gb_ref.dtype)
    csf_ref[0] = cf.astype(csf_ref.dtype)
    csb_ref[0] = cb.astype(csb_ref.dtype)
    rsf_ref[0] = rf.astype(rsf_ref.dtype)
    rsb_ref[0] = rb.astype(rsb_ref.dtype)

    @pl.when(t == T - 1)
    def _():
        fc_ref[:] = cf_scr[:]
        fr_ref[:] = rf_scr[:]


def _xfused_bwd_kernel(cell_clip: float, is_fwd_dir: bool,
                       dy_ref, m_ref, g_ref, cp_ref, rp_ref, x_ref,
                       ic_ref, ir_ref,
                       w_xr_ref, w_rm_ref, peep_ref,
                       dfc_ref, dfr_ref,
                       dx_ref, dic_ref, dir_ref,
                       dwxr_out, dwrm_out, dbias_out, dpeep_out,
                       dc_scr, dr_scr):
    """One direction's reverse sweep.  Block index maps present frames
    in reverse processing order (direction f walks T-1→0, direction b
    walks 0→T-1); cp/rp read the PREVIOUS-in-processing-order state
    block, with the true initial state substituted at the boundary
    (init_c/init_r for direction f, zeros for direction b)."""
    sb = pl.program_id(0)
    p = pl.program_id(1)
    nS = pl.num_programs(0)
    T = pl.num_programs(1)

    # weight grads accumulate DIRECTLY into the resident output refs
    # (constant index map → they live in VMEM for the whole grid);
    # a scratch copy of the same [D,G]/[P,G] accumulators blew the
    # 16 MB scoped-VMEM budget on real hardware by ~4 MB
    @pl.when((sb == 0) & (p == 0))
    def _():
        dwxr_out[:] = jnp.zeros_like(dwxr_out)
        dwrm_out[:] = jnp.zeros_like(dwrm_out)
        dbias_out[:] = jnp.zeros_like(dbias_out)
        dpeep_out[:] = jnp.zeros_like(dpeep_out)

    @pl.when(p == 0)
    def _():
        dc_scr[:] = dfc_ref[:]
        dr_scr[:] = dfr_ref[:]

    C = dc_scr.shape[1]
    mask_t = m_ref[0][:, 0:1]
    at_boundary = p == T - 1
    if is_fwd_dir:
        c_prev = jnp.where(at_boundary, ic_ref[:].astype(jnp.float32),
                           cp_ref[0].astype(jnp.float32))
        r_prev = jnp.where(at_boundary, ir_ref[:].astype(jnp.float32),
                           rp_ref[0].astype(jnp.float32))
    else:
        c_prev = jnp.where(at_boundary, 0.0,
                           cp_ref[0].astype(jnp.float32))
        r_prev = jnp.where(at_boundary, 0.0,
                           rp_ref[0].astype(jnp.float32))

    gates = g_ref[0].astype(jnp.float32)
    gt = gates[:, :C]
    i = gates[:, C:2 * C]
    f = gates[:, 2 * C:3 * C]
    o = gates[:, 3 * C:]
    cu = f * c_prev + i * gt
    c = jnp.clip(cu, -cell_clip, cell_clip) if cell_clip > 0 else cu
    tanh_c = jnp.tanh(c)
    m = o * tanh_c
    dR_after = dy_ref[0].astype(jnp.float32) * mask_t + dr_scr[:]
    dr_new = mask_t * dR_after
    dr_prev = (1.0 - mask_t) * dR_after
    dc_new = mask_t * dc_scr[:]
    dc_prev_skip = (1.0 - mask_t) * dc_scr[:]
    dm = _mm_k(dr_new, w_rm_ref[:].T, True)
    do = dm * tanh_c
    dc = dc_new + dm * o * (1.0 - tanh_c * tanh_c)
    do_lin = do * o * (1.0 - o)
    dc = dc + do_lin * peep_ref[2]
    if cell_clip > 0:
        dcu = dc * (jnp.abs(cu) < cell_clip).astype(jnp.float32)
    else:
        dcu = dc
    di_lin = dcu * gt * i * (1.0 - i)
    df_lin = dcu * c_prev * f * (1.0 - f)
    dg_lin = dcu * i * (1.0 - gt * gt)
    dc_prev = dcu * f + di_lin * peep_ref[0] \
        + df_lin * peep_ref[1] + dc_prev_skip
    dgates = jnp.concatenate([dg_lin, di_lin, df_lin, do_lin], axis=1)
    # one [blk, 4C] x [4C, D+P] product yields dx | dr together (the
    # [w_x; w_r] stacking the fused-bidirectional kernel uses)
    D = dx_ref.shape[-1]
    dxr = _mm_k(dgates, w_xr_ref[:].T, True)
    dr_prev = dr_prev + dxr[:, D:]
    dc_scr[:] = dc_prev
    dr_scr[:] = dr_prev
    x = x_ref[0]
    dx_ref[0] = dxr[:, :D].astype(dx_ref.dtype)
    # weight-gradient accumulation in VMEM: the whole point of the
    # variant — no [T, S, 4C] dgates stream ever reaches HBM
    dg_b = dgates.astype(jnp.bfloat16)
    xr_b = jnp.concatenate([x.astype(jnp.bfloat16),
                            r_prev.astype(jnp.bfloat16)], axis=1)
    dwxr_out[:] += jnp.dot(xr_b.T, dg_b,
                           preferred_element_type=jnp.float32)
    dwrm_out[:] += jnp.dot(m.astype(jnp.bfloat16).T,
                           dr_new.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    dbias_out[0, :] += jnp.sum(dgates, axis=0)
    dpeep_out[0, :] += jnp.sum(di_lin * c_prev, axis=0)
    dpeep_out[1, :] += jnp.sum(df_lin * c_prev, axis=0)
    dpeep_out[2, :] += jnp.sum(do_lin * c, axis=0)

    @pl.when(p == T - 1)
    def _():
        dic_ref[:] = dc_scr[:]
        dir_ref[:] = dr_scr[:]


def _bixfused_bwd_kernel(cell_clip: float,
                         dyf_ref, dyb_ref, mf_ref, mb_ref,
                         gf_ref, gb_ref, cpf_ref, cpb_ref,
                         rpf_ref, rpb_ref, xf_ref, xb_ref,
                         ic2_ref, ir2_ref,
                         w_xr2_ref, w_rm2_ref, peep2_ref,
                         dfc2_ref, dfr2_ref,
                         dxf_ref, dxb_ref, dic2_ref, dir2_ref,
                         dwxr2_out, dwrm2_out,
                         dbias2_out, dpeep2_out,
                         dcf_scr, drf_scr, dcb_scr, drb_scr):
    """BOTH directions' reverse sweeps in one grid step (direction f at
    frame T-1-p via reverse index maps, direction b at frame p) — the
    same two-directions-per-step overlap the forward kernel uses.  One
    T-length sequential grid instead of two back-to-back halves the
    latency-bound critical path of the backward pass.  Weight-grad
    accumulators live in the stacked resident outputs; VMEM ≈ 33 MB at
    the flagship shape, so the wrapper raises vmem_limit_bytes."""
    sb = pl.program_id(0)
    p = pl.program_id(1)
    nS = pl.num_programs(0)
    T = pl.num_programs(1)

    @pl.when((sb == 0) & (p == 0))
    def _():
        dwxr2_out[:] = jnp.zeros_like(dwxr2_out)
        dwrm2_out[:] = jnp.zeros_like(dwrm2_out)
        dbias2_out[:] = jnp.zeros_like(dbias2_out)
        dpeep2_out[:] = jnp.zeros_like(dpeep2_out)

    @pl.when(p == 0)
    def _():
        dcf_scr[:] = dfc2_ref[0]
        drf_scr[:] = dfr2_ref[0]
        dcb_scr[:] = dfc2_ref[1]
        drb_scr[:] = dfr2_ref[1]

    C = dcf_scr.shape[1]
    at_boundary = p == T - 1

    def dir_body(d, dy_v, m_v, g_v, cp_v, rp_v, x_v,
                 dc_scr, dr_scr, dx_ref):
        mask_t = m_v[:, 0:1]
        c_prev = jnp.where(at_boundary, ic2_ref[d].astype(jnp.float32),
                           cp_v.astype(jnp.float32))
        r_prev = jnp.where(at_boundary, ir2_ref[d].astype(jnp.float32),
                           rp_v.astype(jnp.float32))
        gates = g_v.astype(jnp.float32)
        gt = gates[:, :C]
        i = gates[:, C:2 * C]
        f = gates[:, 2 * C:3 * C]
        o = gates[:, 3 * C:]
        cu = f * c_prev + i * gt
        c = jnp.clip(cu, -cell_clip, cell_clip) if cell_clip > 0 else cu
        tanh_c = jnp.tanh(c)
        m = o * tanh_c
        dR_after = dy_v.astype(jnp.float32) * mask_t + dr_scr[:]
        dr_new = mask_t * dR_after
        dr_prev = (1.0 - mask_t) * dR_after
        dc_new = mask_t * dc_scr[:]
        dc_prev_skip = (1.0 - mask_t) * dc_scr[:]
        dm = _mm_k(dr_new, w_rm2_ref[d].T, True)
        do = dm * tanh_c
        dc = dc_new + dm * o * (1.0 - tanh_c * tanh_c)
        do_lin = do * o * (1.0 - o)
        dc = dc + do_lin * peep2_ref[d, 2]
        if cell_clip > 0:
            dcu = dc * (jnp.abs(cu) < cell_clip).astype(jnp.float32)
        else:
            dcu = dc
        di_lin = dcu * gt * i * (1.0 - i)
        df_lin = dcu * c_prev * f * (1.0 - f)
        dg_lin = dcu * i * (1.0 - gt * gt)
        dc_prev = dcu * f + di_lin * peep2_ref[d, 0] \
            + df_lin * peep2_ref[d, 1] + dc_prev_skip
        dgates = jnp.concatenate([dg_lin, di_lin, df_lin, do_lin],
                                 axis=1)
        # one [blk, 4C] x [4C, D+P] product yields dx | dr contribution
        # together (the [w_x; w_r] stacking of the forward kernel)
        D = dx_ref.shape[-1]
        dxr = _mm_k(dgates, w_xr2_ref[d].T, True)
        dr_prev = dr_prev + dxr[:, D:]
        dc_scr[:] = dc_prev
        dr_scr[:] = dr_prev
        dx_ref[0] = dxr[:, :D].astype(dx_ref.dtype)
        dg_b = dgates.astype(jnp.bfloat16)
        xr_b = jnp.concatenate([x_v.astype(jnp.bfloat16),
                                r_prev.astype(jnp.bfloat16)], axis=1)
        dwxr2_out[d] += jnp.dot(xr_b.T, dg_b,
                                preferred_element_type=jnp.float32)
        dwrm2_out[d] += jnp.dot(m.astype(jnp.bfloat16).T,
                                dr_new.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
        dbias2_out[d, 0, :] += jnp.sum(dgates, axis=0)
        dpeep2_out[d, 0, :] += jnp.sum(di_lin * c_prev, axis=0)
        dpeep2_out[d, 1, :] += jnp.sum(df_lin * c_prev, axis=0)
        dpeep2_out[d, 2, :] += jnp.sum(do_lin * c, axis=0)

    dir_body(0, dyf_ref[0], mf_ref[0], gf_ref[0], cpf_ref[0],
             rpf_ref[0], xf_ref[0], dcf_scr, drf_scr, dxf_ref)
    dir_body(1, dyb_ref[0], mb_ref[0], gb_ref[0], cpb_ref[0],
             rpb_ref[0], xb_ref[0], dcb_scr, drb_scr, dxb_ref)

    @pl.when(p == T - 1)
    def _():
        dic2_ref[0] = dcf_scr[:]
        dic2_ref[1] = dcb_scr[:]
        dir2_ref[0] = drf_scr[:]
        dir2_ref[1] = drb_scr[:]


@partial(jax.jit, static_argnames=("cell_clip", "interpret"))
def _bixfused_train_bwd(dysf, dysb, mask, gf, gb, csf, csb, rsf, rsb,
                        x, init_c, init_r, w_x2, w_r2, w_rm2, peep2,
                        d_final_c, d_final_r, cell_clip, interpret):
    """Fused bidirectional backward: one pallas_call, both directions
    per grid step.  Returns (dx, dic, dir, dwx2, dwr2, dwrm2, dbias2,
    dpeep2)."""
    T, S, G = gf.shape
    C = G // 4
    P = w_r2.shape[1]
    D = w_x2.shape[1]
    blk = min(S, S_BLK)
    nS = S // blk
    dyf_t = jnp.swapaxes(dysf, 0, 1).astype(jnp.bfloat16)
    dyb_t = jnp.swapaxes(dysb, 0, 1).astype(jnp.bfloat16)
    x_t = jnp.swapaxes(x, 0, 1).astype(jnp.bfloat16)
    mask_t = jnp.broadcast_to(
        jnp.swapaxes(mask, 0, 1)[:, :, None], (T, S, 128))
    zc = jnp.zeros_like(init_c)
    zr = jnp.zeros_like(init_r)
    ic2 = jnp.stack([init_c, zc])
    ir2 = jnp.stack([init_r, zr])
    dfc2 = jnp.stack([d_final_c, zc])
    dfr2 = jnp.stack([d_final_r, zr])
    rev = partial(_rev_idx, T=T)
    rprev = partial(_rev_prev_idx, T=T)
    fnext = partial(_fwd_next_idx, T=T)

    def res2(shape):
        return _resident3((2,) + shape)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    w_xr2 = jnp.concatenate([w_x2, w_r2], axis=1)   # [2, D+P, G]
    outs = pl.pallas_call(
        partial(_bixfused_bwd_kernel, cell_clip),
        grid=(nS, T),
        in_specs=[
            rev((blk, P)), _fwd_idx((blk, P)),          # dyf, dyb
            rev((blk, 128)), _fwd_idx((blk, 128)),      # masks
            rev((blk, G)), _fwd_idx((blk, G)),          # gates
            rprev((blk, C)), fnext((blk, C)),           # c_prev streams
            rprev((blk, P)), fnext((blk, P)),           # r_prev streams
            rev((blk, D)), _fwd_idx((blk, D)),          # x views
            res2((blk, C)), res2((blk, P)),             # ic2, ir2
            res2((D + P, G)), res2((C, P)), res2((3, C)),
            res2((blk, C)), res2((blk, P)),             # dfc2, dfr2
        ],
        out_specs=[
            rev((blk, D)), _fwd_idx((blk, D)),          # dxf, dxb
            res2((blk, C)), res2((blk, P)),             # dic2, dir2
            res2((D + P, G)), res2((C, P)),
            res2((1, G)), res2((3, C)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, S, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, S, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((2, S, C), jnp.float32),
            jax.ShapeDtypeStruct((2, S, P), jnp.float32),
            jax.ShapeDtypeStruct((2, D + P, G), jnp.float32),
            jax.ShapeDtypeStruct((2, C, P), jnp.float32),
            jax.ShapeDtypeStruct((2, 1, G), jnp.float32),
            jax.ShapeDtypeStruct((2, 3, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, C), jnp.float32),
            pltpu.VMEM((blk, P), jnp.float32),
            pltpu.VMEM((blk, C), jnp.float32),
            pltpu.VMEM((blk, P), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(dyf_t, dyb_t, mask_t, mask_t, gf, gb, csf, csb, rsf, rsb,
      x_t, x_t, ic2, ir2, w_xr2, w_rm2, peep2, dfc2, dfr2)
    (dxf, dxb, dic2, dir2, dwxr2, dwrm2, dbias2, dpeep2) = outs
    dx = (dxf.astype(jnp.float32) + dxb.astype(jnp.float32)
          ).astype(jnp.bfloat16)
    return (jnp.swapaxes(dx, 0, 1), dic2[0], dir2[0],
            dwxr2[:, :D], dwxr2[:, D:], dwrm2, dbias2[:, 0], dpeep2)


@partial(jax.jit, static_argnames=("cell_clip", "interpret"))
def _bixfused_train_fwd(x, mask, w_x2, w_r2, w_rm2, peep2, bias2,
                        init_c, init_r, cell_clip, interpret):
    S, T, D = x.shape
    G = w_x2.shape[2]
    C = G // 4
    P = w_r2.shape[1]
    blk = min(S, S_BLK)
    assert S % blk == 0
    nS = S // blk
    x_t = jnp.swapaxes(x, 0, 1).astype(jnp.bfloat16)
    mask_t = jnp.broadcast_to(
        jnp.swapaxes(mask, 0, 1)[:, :, None], (T, S, 128))
    # stacked [x | r] contraction weights: one gate matmul per step
    w_xr2 = jnp.concatenate([w_x2, w_r2], axis=1)
    outs = pl.pallas_call(
        partial(_bixfused_fwd_kernel, cell_clip),
        grid=(nS, T),
        in_specs=[
            _fwd_idx((blk, D)), _rev_idx((blk, D), T),
            _fwd_idx((blk, 128)), _rev_idx((blk, 128), T),
            _resident3((2, D + P, G)),
            _resident3((2, C, P)),
            _resident3((2, 3, C)), _resident3((2, G)),
            _per_block((blk, C)), _per_block((blk, P)),
        ],
        out_specs=[
            _fwd_idx((blk, G)), _rev_idx((blk, G), T),
            _fwd_idx((blk, C)), _rev_idx((blk, C), T),
            _fwd_idx((blk, P)), _rev_idx((blk, P), T),
            _per_block((blk, C)), _per_block((blk, P)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, S, G), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, S, G), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, S, C), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, S, C), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, S, P), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, S, P), jnp.bfloat16),
            jax.ShapeDtypeStruct((S, C), jnp.float32),
            jax.ShapeDtypeStruct((S, P), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, C), jnp.float32),
            pltpu.VMEM((blk, P), jnp.float32),
            pltpu.VMEM((blk, C), jnp.float32),
            pltpu.VMEM((blk, P), jnp.float32),
        ],
        interpret=interpret,
    )(x_t, x_t, mask_t, mask_t, w_xr2, w_rm2, peep2, bias2,
      init_c, init_r)
    return outs


@partial(jax.jit, static_argnames=("cell_clip", "interpret",
                                   "is_fwd_dir"))
def _xfused_train_bwd_dir(dy, mask, gates, cs, rs, x,
                          init_c, init_r, w_x, w_r, w_rm, peep,
                          d_final_c, d_final_r,
                          cell_clip, interpret, is_fwd_dir):
    """One direction's fused backward.  All array args are device-side;
    dy/x are [S, T, *], gates/cs/rs the [T, S, *] forward emissions."""
    T, S, G = gates.shape
    C = G // 4
    P = w_r.shape[0]
    D = w_x.shape[0]
    blk = min(S, S_BLK)
    nS = S // blk
    dy_t = jnp.swapaxes(dy, 0, 1).astype(jnp.bfloat16)
    x_t = jnp.swapaxes(x, 0, 1).astype(jnp.bfloat16)
    mask_t = jnp.broadcast_to(
        jnp.swapaxes(mask, 0, 1)[:, :, None], (T, S, 128))
    if is_fwd_dir:
        step_idx = partial(_rev_idx, T=T)
        prev_idx = partial(_rev_prev_idx, T=T)
    else:
        step_idx = _fwd_idx
        prev_idx = partial(_fwd_next_idx, T=T)
    w_xr = jnp.concatenate([w_x, w_r], axis=0)   # [D+P, G]
    outs = pl.pallas_call(
        partial(_xfused_bwd_kernel, cell_clip, is_fwd_dir),
        grid=(nS, T),
        in_specs=[
            step_idx((blk, P)),            # dy
            step_idx((blk, 128)),          # mask
            step_idx((blk, G)),            # gates
            prev_idx((blk, C)),            # c_prev stream
            prev_idx((blk, P)),            # r_prev stream
            step_idx((blk, D)),            # x
            _per_block((blk, C)),          # init_c
            _per_block((blk, P)),          # init_r
            _resident3((D + P, G)),
            _resident3((C, P)), _resident3((3, C)),
            _per_block((blk, C)), _per_block((blk, P)),
        ],
        out_specs=[
            step_idx((blk, D)),            # dx
            _per_block((blk, C)), _per_block((blk, P)),
            _resident3((D + P, G)),
            _resident3((C, P)), _resident3((1, G)), _resident3((3, C)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, S, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((S, C), jnp.float32),
            jax.ShapeDtypeStruct((S, P), jnp.float32),
            jax.ShapeDtypeStruct((D + P, G), jnp.float32),
            jax.ShapeDtypeStruct((C, P), jnp.float32),
            jax.ShapeDtypeStruct((1, G), jnp.float32),
            jax.ShapeDtypeStruct((3, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, C), jnp.float32),
            pltpu.VMEM((blk, P), jnp.float32),
        ],
        interpret=interpret,
    )(dy_t, mask_t, gates, cs, rs, x_t, init_c, init_r,
      w_xr, w_rm, peep, d_final_c, d_final_r)
    (dx, dic, dir_, dwxr, dwrm, dbias, dpeep) = outs
    return (jnp.swapaxes(dx, 0, 1), dic, dir_, dwxr[:D], dwxr[D:],
            dwrm, dbias[0], dpeep)


@functools.lru_cache(maxsize=None)
def _get_bixfused_core(cell_clip: float, interpret: bool):
    """Custom-VJP x-fused bidirectional LSTMP core.

    core(x [S,T,D] (any dtype, used as bf16), mask, w_x2 [2,D,4C] bf16,
    w_r2 [2,P,4C] bf16, w_rm2 [2,C,P] bf16, peep2 [2,3,C] f32,
    bias2 [2,4C] f32, init_c, init_r) → (ysf, ysb, final_c, final_r)."""

    def _forward(x, mask, w_x2, w_r2, w_rm2, peep2, bias2,
                 init_c, init_r):
        (gf, gb, csf, csb, rsf, rsb, fc, fr) = _bixfused_train_fwd(
            x, mask, w_x2, w_r2, w_rm2, peep2, bias2, init_c, init_r,
            cell_clip, interpret)
        mask_e = mask[:, :, None].astype(rsf.dtype)
        ysf = jnp.swapaxes(rsf, 0, 1) * mask_e
        ysb = jnp.swapaxes(rsb, 0, 1) * mask_e
        res = (x, mask, gf, gb, csf, csb, rsf, rsb,
               w_x2, w_r2, w_rm2, peep2, init_c, init_r)
        return (ysf, ysb, fc, fr), res

    @jax.custom_vjp
    def core(x, mask, w_x2, w_r2, w_rm2, peep2, bias2, init_c, init_r):
        out, _ = _forward(x, mask, w_x2, w_r2, w_rm2, peep2, bias2,
                          init_c, init_r)
        return out

    def fwd(x, mask, w_x2, w_r2, w_rm2, peep2, bias2, init_c, init_r):
        return _forward(x, mask, w_x2, w_r2, w_rm2, peep2, bias2,
                        init_c, init_r)

    def bwd(res, cots):
        import os
        dysf, dysb, d_final_c, d_final_r = cots
        (x, mask, gf, gb, csf, csb, rsf, rsb,
         w_x2, w_r2, w_rm2, peep2, init_c, init_r) = res
        if not os.environ.get("KALDI_ASLP_LSTM_SPLIT_BWD"):
            dx, dic, dir_, dwx2, dwr2, dwrm2, db2, dp2 = \
                _bixfused_train_bwd(
                    dysf, dysb, mask, gf, gb, csf, csb, rsf, rsb,
                    x, init_c, init_r, w_x2, w_r2, w_rm2, peep2,
                    d_final_c, d_final_r, cell_clip, interpret)
            return (dx, None, dwx2, dwr2, dwrm2, dp2, db2, dic, dir_)
        # split per-direction fallback: ~half the VMEM footprint
        S = x.shape[0]
        zc = jnp.zeros((S, csf.shape[2]), jnp.float32)
        zr = jnp.zeros((S, rsf.shape[2]), jnp.float32)
        dxf, dic, dir_, dwxf, dwrf, dwrmf, dbf, dpf = \
            _xfused_train_bwd_dir(
                dysf, mask, gf, csf, rsf, x, init_c, init_r,
                w_x2[0], w_r2[0], w_rm2[0], peep2[0],
                d_final_c, d_final_r, cell_clip, interpret, True)
        dxb, _, _, dwxb, dwrb, dwrmb, dbb, dpb = \
            _xfused_train_bwd_dir(
                dysb, mask, gb, csb, rsb, x, zc, zr,
                w_x2[1], w_r2[1], w_rm2[1], peep2[1],
                zc, zr, cell_clip, interpret, False)
        dx = (dxf.astype(jnp.float32)
              + dxb.astype(jnp.float32)).astype(jnp.bfloat16)
        return (dx, None,
                jnp.stack([dwxf, dwxb]), jnp.stack([dwrf, dwrb]),
                jnp.stack([dwrmf, dwrmb]),
                jnp.stack([dpf, dpb]), jnp.stack([dbf, dbb]),
                dic, dir_)

    core.defvjp(fwd, bwd)
    return core


def bilstmp_xfused_train_core(x, mask, wf_gifo_x, wb_gifo_x,
                              wf_gifo_r, wf_r_m, peep_f,
                              wb_gifo_r, wb_r_m, peep_b,
                              bias_f, bias_b, init_c, init_r,
                              cell_clip: float = 50.0,
                              interpret: bool = False):
    """x-fused bidirectional LSTMP training core: streams x, computes
    the input projection in-kernel, and accumulates ALL weight
    gradients in VMEM (see the section comment above).  Weight layout
    matches the reference component (w_gifo_x [4C, D], w_gifo_r
    [4C, P], w_r_m [P, C]).

    The kernel wants lane-aligned inputs (D % 128 == 0); narrower
    inputs (a stack's first layer sees the 40-120-dim feature stream)
    are ZERO-PADDED to the next lane multiple here, OUTSIDE the
    custom-VJP core, so autodiff slices dx / the dwx pad rows back out
    exactly.  Padding is free next to the alternative: the xg fallback
    streams [T,S,4C] projections (+ cotangents) through HBM — ~2 GB a
    step for the flagship's first layer — where the padded x stream is
    ~26 MB."""
    S, T, D = x.shape
    x = x.astype(jnp.bfloat16)
    padD = (-D) % 128
    if padD:
        x = jnp.concatenate(
            [x, jnp.zeros((S, T, padD), x.dtype)], axis=-1)
        zrow = jnp.zeros((wf_gifo_x.shape[0], padD), wf_gifo_x.dtype)
        wf_gifo_x = jnp.concatenate([wf_gifo_x, zrow], axis=1)
        wb_gifo_x = jnp.concatenate([wb_gifo_x, zrow], axis=1)
    blk = min(S, S_BLK)
    pad = (-S) % blk
    if pad:
        def padS(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        x, mask = padS(x), padS(mask)
        init_c, init_r = padS(init_c), padS(init_r)
    core = _get_bixfused_core(float(cell_clip), bool(interpret))
    bf = jnp.bfloat16
    w_x2 = jnp.stack([jnp.swapaxes(wf_gifo_x, 0, 1),
                      jnp.swapaxes(wb_gifo_x, 0, 1)]).astype(bf)
    w_r2 = jnp.stack([jnp.swapaxes(wf_gifo_r, 0, 1),
                      jnp.swapaxes(wb_gifo_r, 0, 1)]).astype(bf)
    w_rm2 = jnp.stack([jnp.swapaxes(wf_r_m, 0, 1),
                       jnp.swapaxes(wb_r_m, 0, 1)]).astype(bf)
    peep2 = jnp.stack([peep_f, peep_b])
    bias2 = jnp.stack([bias_f, bias_b])
    ysf, ysb, fc, fr = core(x, mask, w_x2, w_r2, w_rm2, peep2, bias2,
                            init_c, init_r)
    if pad:
        ysf, ysb, fc, fr = ysf[:S], ysb[:S], fc[:S], fr[:S]
    return ysf, ysb, fc, fr
