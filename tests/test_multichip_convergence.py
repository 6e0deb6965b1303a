"""Multi-round convergence equivalence across distributed strategies
(reference: src/aslp-parallel/bmuf-worker.h:56-67 — "similar
convergence as standard SGD" is the property BMUF/EASGD exist to
preserve; VERDICT r2 item 9).  Runs BSP, BMUF, and EASGD for 60 rounds
on identical data on the virtual 8-device mesh and asserts the
held-out loss trajectories agree in the "similar convergence" sense:
every strategy converges substantially, and final losses stay within a
small factor of each other."""

import numpy as np
import pytest

from kaldi_aslp_tpu.parallel.convergence import run_convergence_comparison


@pytest.mark.slow
def test_strategies_converge_similarly():
    res = run_convergence_comparison(8, n_rounds=60, learn_rate=1.5,
                                     per_device_batch=16)
    assert set(res) == {"bsp", "bmuf", "easgd"}
    init = res["bsp"][0]
    finals = {}
    for name, traj in res.items():
        traj = np.asarray(traj)
        assert np.isfinite(traj).all(), f"{name} diverged (NaN/inf)"
        assert traj[0] == pytest.approx(init), \
            "all strategies must start from the same model"
        # substantial convergence: >45% held-out loss reduction
        assert traj[-1] < 0.55 * init, \
            f"{name} failed to converge: {traj[0]:.4f} -> {traj[-1]:.4f}"
        # overall downward trend (allow local noise): last-10 mean well
        # below first-10 mean
        assert traj[-10:].mean() < 0.7 * traj[:10].mean(), name
        finals[name] = float(traj[-1])
    # "similar convergence": no strategy ends more than 2x another
    lo, hi = min(finals.values()), max(finals.values())
    assert hi <= 2.0 * lo, f"strategies diverged from each other: {finals}"


def test_convergence_comparison_small():
    """Fast smoke at 10 rounds on 4 devices: trajectories recorded for
    every strategy, all finite, all starting equal."""
    res = run_convergence_comparison(4, n_rounds=10)
    for name, traj in res.items():
        assert len(traj) == 11
        assert np.isfinite(np.asarray(traj)).all(), name
    starts = {round(v[0], 6) for v in res.values()}
    assert len(starts) == 1


def test_all_six_strategies_run_affine():
    """ASGD/MASGD/SOD ride the same harness (round-4 verdict item 9):
    every strategy records a finite trajectory from the same init."""
    from kaldi_aslp_tpu.parallel.convergence import ALL_STRATEGIES

    res = run_convergence_comparison(4, n_rounds=8,
                                     strategies=ALL_STRATEGIES)
    assert set(res) == set(ALL_STRATEGIES)
    for name, traj in res.items():
        assert np.isfinite(np.asarray(traj)).all(), name


@pytest.mark.slow
def test_blstm_hardcorpus_six_strategy_band():
    """The round-4 evidence: six strategies on a small BLSTM over
    hard-corpus frames, >=5 converging into a <=1.25x final-loss band.
    Runs in a subprocess — the 8-virtual-device CPU mesh's collective
    rendezvous hard-aborts the process under host contention, which
    must not take pytest down (the raised terminate timeout makes the
    straggler wait instead where possible)."""
    import os

    from kaldi_aslp_tpu.parallel.convergence import (
        _best_band,
        run_comparison_subprocess,
    )

    res = run_comparison_subprocess(
        8, 300, 1.0,
        repo_root=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    if len(res) < 5:
        pytest.skip("mesh subprocesses kept deadlocking under host "
                    f"contention; only {sorted(res)} completed")
    finals = {k: v[-1] for k, v in res.items()}
    init = next(iter(res.values()))[0]
    conv = {k: v for k, v in finals.items() if v < 0.55 * init}
    assert len(conv) >= 5, finals
    assert _best_band(conv, 5) <= 1.25, finals
