"""EASGD/ASGD/MASGD parameter-server strategy tests.

Equivalence-tested against a plain-numpy simulation of the reference's
MPI schedule (workers sync one at a time, round-robin arrivals), the
same validation style as the BSP/BMUF tests (SURVEY.md §4; reference:
src/aslp-parallel/easgd-*.cc, asgd-*.cc, masgd-server.cc)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaldi_aslp_tpu.parallel import (
    PsOptions,
    PsState,
    make_mesh,
    make_ps_round_step,
    ps_sync_round,
    stack_worker_states,
)


def _np_local_sgd(w, data, lr, steps):
    """Plain-SGD mirror of the jitted local loss (least squares)."""
    x, y = data
    for _ in range(steps):
        pred = x @ w
        grad = x.T @ (pred - y) / len(y)
        w = w - lr * grad
    return w


def _np_easgd_round(server, workers, alpha):
    for i in range(len(workers)):
        s_old = server.copy()
        server = (1 - alpha) * server + alpha * workers[i]
        workers[i] = (1 - alpha) * workers[i] + alpha * s_old
    return server, workers


def _np_asgd_round(server, workers, prevs, alpha):
    for i in range(len(workers)):
        delta = workers[i] - prevs[i]
        server = server + alpha * delta
        workers[i] = server.copy()
        prevs[i] = server.copy()
    return server, workers, prevs


def _np_masgd_round(server, workers, prevs, diffs, momentum, local=True):
    for i in range(len(workers)):
        delta = workers[i] - prevs[i]
        j = i if local else 0
        diffs[j] = momentum * diffs[j] + delta
        server = server + diffs[j]
        workers[i] = server.copy()
        prevs[i] = server.copy()
    return server, workers, prevs, diffs


def _setup(rng, W=4, dim=6):
    w0 = rng.randn(dim, 1).astype(np.float32)
    datasets = []
    for _ in range(W):
        x = rng.randn(32, dim).astype(np.float32)
        y = (x @ rng.randn(dim, 1) + 0.1 * rng.randn(32, 1)).astype(
            np.float32)
        datasets.append((x, y))
    return w0, datasets


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def _mesh_and_step(W, inner, mode, alpha=0.5, momentum=0.9,
                   masgd_type="local"):
    mesh = make_mesh(("worker",), devices=jax.devices()[:W])

    def loss_fn(p, batch):
        pred = batch["x"] @ p["w"]
        loss = jnp.mean((pred - batch["y"]) ** 2) / 2.0
        return loss, {}

    def update_fn(p, g, opt, lr):
        return jax.tree_util.tree_map(
            lambda a, b: a - lr * b, p, g), opt

    opts = PsOptions(mode=mode, alpha=alpha, masgd_momentum=momentum,
                     masgd_type=masgd_type)
    step = make_ps_round_step(loss_fn, update_fn, mesh, opts,
                              inner_steps=inner)
    return step, opts


@pytest.mark.parametrize("mode", ["easgd", "asgd", "masgd"])
def test_ps_matches_numpy_mirror(rng, mode):
    W, dim, inner, lr, rounds = 4, 6, 3, 0.05, 5
    alpha = 0.5 if mode == "easgd" else 1.0
    momentum = 0.9
    w0, datasets = _setup(rng, W, dim)

    # --- numpy simulation of the reference MPI schedule ---
    server = w0.copy()
    workers = [w0.copy() for _ in range(W)]
    prevs = [w0.copy() for _ in range(W)]
    diffs = [np.zeros_like(w0) for _ in range(W)]
    for _ in range(rounds):
        for i in range(W):
            workers[i] = _np_local_sgd(workers[i], datasets[i], lr, inner)
        if mode == "easgd":
            server, workers = _np_easgd_round(server, workers, alpha)
        elif mode == "asgd":
            server, workers, prevs = _np_asgd_round(
                server, workers, prevs, alpha)
        else:
            server, workers, prevs, diffs = _np_masgd_round(
                server, workers, prevs, diffs, momentum)

    # --- jax path: shard_map local steps + scanned sync round ---
    step, opts = _mesh_and_step(W, inner, mode, alpha, momentum)
    state = PsState({"w": jnp.asarray(w0)}, W, opts)
    opt_states = stack_worker_states({}, W)
    batch = {
        "x": jnp.asarray(np.stack([d[0] for d in datasets])),
        "y": jnp.asarray(np.stack([d[1] for d in datasets])),
    }
    for _ in range(rounds):
        state.workers, opt_states, _ = step(
            state.workers, opt_states, batch, lr)
        state = ps_sync_round(state)

    np.testing.assert_allclose(
        np.asarray(state.server["w"]), server, rtol=0, atol=2e-5)
    for i in range(W):
        np.testing.assert_allclose(
            np.asarray(state.workers["w"][i]), workers[i],
            rtol=0, atol=2e-5)


def test_masgd_global_variant(rng):
    """GMASGD shares ONE momentum buffer across workers
    (masgd-server.h:22 MASGD_TYPE switch)."""
    W, dim, inner, lr, rounds = 3, 5, 2, 0.05, 4
    w0, datasets = _setup(rng, W, dim)
    server = w0.copy()
    workers = [w0.copy() for _ in range(W)]
    prevs = [w0.copy() for _ in range(W)]
    diffs = [np.zeros_like(w0)]
    for _ in range(rounds):
        for i in range(W):
            workers[i] = _np_local_sgd(workers[i], datasets[i], lr, inner)
        server, workers, prevs, diffs = _np_masgd_round(
            server, workers, prevs, diffs, 0.9, local=False)

    step, opts = _mesh_and_step(W, inner, "masgd", momentum=0.9,
                                masgd_type="global")
    state = PsState({"w": jnp.asarray(w0)}, W, opts)
    opt_states = stack_worker_states({}, W)
    batch = {
        "x": jnp.asarray(np.stack([d[0] for d in datasets])),
        "y": jnp.asarray(np.stack([d[1] for d in datasets])),
    }
    for _ in range(rounds):
        state.workers, opt_states, _ = step(
            state.workers, opt_states, batch, lr)
        state = ps_sync_round(state)
    np.testing.assert_allclose(
        np.asarray(state.server["w"]), server, rtol=0, atol=2e-5)


def test_asgd_single_worker_is_sgd(rng):
    """alpha=1, one worker, sync every step == plain SGD (the server
    just mirrors the worker trajectory)."""
    dim, lr, steps = 5, 0.05, 6
    w0, datasets = _setup(rng, 1, dim)
    ref = _np_local_sgd(w0.copy(), datasets[0], lr, steps)

    step, opts = _mesh_and_step(1, 1, "asgd", alpha=1.0)
    state = PsState({"w": jnp.asarray(w0)}, 1, opts)
    opt_states = stack_worker_states({}, 1)
    batch = {"x": jnp.asarray(datasets[0][0][None]),
             "y": jnp.asarray(datasets[0][1][None])}
    for _ in range(steps):
        state.workers, opt_states, _ = step(
            state.workers, opt_states, batch, lr)
        state = ps_sync_round(state)
    np.testing.assert_allclose(np.asarray(state.server["w"]), ref,
                               rtol=0, atol=1e-5)


def test_ps_custom_arrival_order(rng):
    """A permuted arrival schedule changes the trajectory exactly as
    the sequential math says it should."""
    W, dim = 3, 4
    w0, _ = _setup(rng, W, dim)
    workers = [w0 + i + 1 for i in range(W)]
    alpha = 0.5
    order = [2, 0, 1]
    server = w0.copy()
    ws = [w.copy() for w in workers]
    for i in order:
        s_old = server.copy()
        server = (1 - alpha) * server + alpha * ws[i]
        ws[i] = (1 - alpha) * ws[i] + alpha * s_old

    opts = PsOptions(mode="easgd", alpha=alpha)
    state = PsState({"w": jnp.asarray(w0)}, W, opts)
    state.workers = {"w": jnp.asarray(np.stack(workers))}
    state = ps_sync_round(state, order=np.asarray(order))
    np.testing.assert_allclose(np.asarray(state.server["w"]), server,
                               rtol=0, atol=1e-6)
    for i in range(W):
        np.testing.assert_allclose(
            np.asarray(state.workers["w"][i]), ws[i], rtol=0, atol=1e-6)


def test_easgd_elastic_pull():
    """Elastic symmetry: server and worker move toward each other by
    the same alpha fraction (easgd-server.cc:85 / easgd-worker.cc:62)."""
    from kaldi_aslp_tpu.parallel import easgd_pair_sync

    s = {"w": jnp.zeros(3)}
    w = {"w": jnp.ones(3)}
    ns, nw = easgd_pair_sync(s, w, 0.25)
    np.testing.assert_allclose(np.asarray(ns["w"]), 0.25)
    np.testing.assert_allclose(np.asarray(nw["w"]), 0.75)
