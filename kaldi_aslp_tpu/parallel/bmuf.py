"""BMUF: block-momentum update filtering as an outer optimizer.

TPU-native equivalent of the reference's scalable sync strategy
(reference: src/aslp-parallel/bmuf-worker.cc:37-68 — every sync_period
frames each worker computes delta = w_local − w_prev, allreduces it,
applies a momentum filter d(t) = m·d(t−1) + (1−m)·lr_bmuf·G(t), sets
w ← w_prev + d (+ Nesterov pre-shift), and snapshots w_prev).

On TPU this is the *outer* loop over DCN-separated host groups or
gradient-accumulation blocks: the inner loop is plain BSP/psum over ICI;
BMUF reconciles blocks trained independently.  Pure pytree math — the
allreduce is either `jax.lax.pmean` (inside shard_map over a 'block'
axis) or host-level process allreduce; both callers just hand this class
the block-averaged parameters."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from kaldi_aslp_tpu.utils.config import Config


@dataclasses.dataclass
class BmufOptions(Config):
    bmuf_momentum: float = 0.9
    bmuf_learn_rate: float = 1.0
    nesterov: bool = True  # NBM variant (the reference default scheme)


class BmufState:
    def __init__(self, params: Any):
        self.w_prev = params
        self.delta = jax.tree_util.tree_map(jnp.zeros_like, params)


def bmuf_sync(
    state: BmufState,
    block_avg_params: Any,
    opts: BmufOptions,
):
    """One BMUF synchronization.

    block_avg_params: the across-block average of locally-trained params
    (the Allreduce(SUM)/num_blocks result).  Returns (new_params, state).
    """
    m, lr = opts.bmuf_momentum, opts.bmuf_learn_rate

    def upd(w_prev, delta, w_avg):
        g = w_avg - w_prev                       # block gradient G(t)
        d = m * delta + (1.0 - m) * lr * g       # momentum filter
        w = w_prev + d
        if opts.nesterov:
            w_next_base = w                      # snapshot BEFORE lookahead
            w = w + m * d                        # Nesterov pre-shift
            return w, d, w_next_base
        return w, d, w

    flat_prev, treedef = jax.tree_util.tree_flatten(state.w_prev)
    flat_delta = jax.tree_util.tree_leaves(state.delta)
    flat_avg = jax.tree_util.tree_leaves(block_avg_params)
    new_w, new_d, new_prev = [], [], []
    for wp, dl, wa in zip(flat_prev, flat_delta, flat_avg):
        w, d, p = upd(wp, dl, wa)
        new_w.append(w)
        new_d.append(d)
        new_prev.append(p)
    state.delta = jax.tree_util.tree_unflatten(treedef, new_d)
    state.w_prev = jax.tree_util.tree_unflatten(treedef, new_prev)
    return jax.tree_util.tree_unflatten(treedef, new_w), state
