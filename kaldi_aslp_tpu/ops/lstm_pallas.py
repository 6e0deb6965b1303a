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

Forward-only; the training path keeps the scan (autodiff), and
inference/decode (Feedforward, online server) uses this kernel."""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
