"""Cross-strategy convergence comparison: BSP vs BMUF vs a parameter-
server mode on IDENTICAL data.

The reference's distributed strategies exist to preserve one property:
"BMUF ... can achieve similar convergence as standard SGD" (reference:
src/aslp-parallel/bmuf-worker.h:56-67); EASGD/ASGD make the same claim
operationally (easgd-server.cc event loop).  This module runs N rounds
of each strategy on the same synthetic frame-classification task, with
the same per-round global batches, and reports the held-out loss
trajectory of each strategy's consensus model — the runnable form of
that claim, consumed by tests/test_multichip_convergence.py and by
__graft_entry__.dryrun_multichip (MULTICHIP_rN evidence).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def run_convergence_comparison(
    n_devices: int,
    n_rounds: int = 50,
    seed: int = 0,
    per_device_batch: int = 8,
    learn_rate: float = 0.5,
) -> Dict[str, List[float]]:
    """Returns {"bsp": [...], "bmuf": [...], "easgd": [...]}: held-out
    xent of the consensus model after each round (index 0 = before any
    training), one list per strategy, all trained on identical data."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from kaldi_aslp_tpu.models.losses import xent_loss
    from kaldi_aslp_tpu.models.nnet import Nnet
    from kaldi_aslp_tpu.models.simple import AffineTransform, Sigmoid
    from kaldi_aslp_tpu.parallel import (
        BmufOptions,
        make_bmuf_block_step,
        make_bsp_train_step,
        make_mesh,
        shard_batch,
        stack_block_states,
    )
    from kaldi_aslp_tpu.parallel.ps import (
        PsOptions,
        PsState,
        make_ps_round_step,
        ps_sync_round,
        stack_worker_states,
    )
    from kaldi_aslp_tpu.train import (
        NnetTrainOptions,
        init_velocity,
        make_sgd_update,
    )

    D, H, V = 10, 16, 5
    devices = jax.devices()[:n_devices]

    net = Nnet()
    net.add(AffineTransform(D, H))
    net.add(Sigmoid(H, H))
    net.add(AffineTransform(H, V))
    params0 = net.init(jax.random.PRNGKey(seed))
    update = make_sgd_update(net, NnetTrainOptions())

    # teacher-labelled synthetic task: smooth, separable, converges fast
    rs = np.random.RandomState(seed)
    teacher = rs.randn(D, V).astype(np.float32)

    def make_xy(n, rstate):
        x = rstate.randn(n, D).astype(np.float32)
        logits = x @ teacher + 0.1 * rstate.randn(n, V).astype(np.float32)
        return x, np.argmax(logits, -1).astype(np.int32)

    B = per_device_batch * n_devices
    rounds = [make_xy(B, rs) for _ in range(n_rounds)]
    x_eval, y_eval = make_xy(512, np.random.RandomState(seed + 1))
    x_eval = jnp.asarray(x_eval)
    y_eval = jnp.asarray(y_eval)

    @jax.jit
    def eval_loss(p):
        y, _ = net.apply(p, x_eval)
        return xent_loss(y, y_eval)[0]

    def loss_fn(p, batch):
        y, _ = net.apply(p, batch["x"], train=True)
        return xent_loss(y, batch["y"])

    lr = jnp.asarray(learn_rate, jnp.float32)
    out: Dict[str, List[float]] = {}

    # ---- BSP: pmean'd gradient over a ('data',) mesh ----
    mesh = make_mesh(("data",), devices=devices)
    bsp_step = make_bsp_train_step(loss_fn, update, mesh)
    p = params0
    vel = init_velocity(params0)
    traj = [float(eval_loss(p))]
    for x, y in rounds:
        batch = shard_batch(
            {"x": jnp.asarray(x), "y": jnp.asarray(y)}, mesh)
        p, vel, _, _ = bsp_step(p, vel, batch, lr)
        traj.append(float(eval_loss(p)))
    out["bsp"] = traj

    # ---- BMUF: BSP inside blocks, block-momentum across blocks ----
    n_blocks = 2 if n_devices >= 2 else 1
    mesh2 = make_mesh(("block", "data"), devices=devices,
                      shape=(n_blocks, n_devices // n_blocks))
    bmuf_step = make_bmuf_block_step(
        loss_fn, update, mesh2, BmufOptions(), inner_steps=1)
    w = w_prev = params0
    import jax.tree_util as jtu
    delta = jtu.tree_map(jnp.zeros_like, params0)
    opt_blk = stack_block_states(init_velocity(params0), n_blocks)
    traj = [float(eval_loss(w))]
    for x, y in rounds:
        batch = jtu.tree_map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh2, P(("block", "data")))),
            {"x": jnp.asarray(x), "y": jnp.asarray(y)})
        w, w_prev, delta, opt_blk, _ = bmuf_step(
            w, w_prev, delta, opt_blk, batch, lr)
        traj.append(float(eval_loss(w_prev)))
    out["bmuf"] = traj

    # ---- EASGD: per-worker local SGD + sequential elastic sync ----
    meshw = make_mesh(("worker",), devices=devices)
    ps_step = make_ps_round_step(loss_fn, update, meshw, inner_steps=1)
    state = PsState(params0, n_devices,
                    PsOptions(mode="easgd", alpha=0.5))
    opt_w = stack_worker_states(init_velocity(params0), n_devices)
    traj = [float(eval_loss(state.server))]
    for x, y in rounds:
        batch = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
        state.workers, opt_w, _ = ps_step(
            state.workers, opt_w, batch, lr)
        state = ps_sync_round(state)
        traj.append(float(eval_loss(state.server)))
    out["easgd"] = traj
    return out
