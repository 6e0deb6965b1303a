"""Aux subsystem tests: SOD, model averaging, profiler, checkpoint,
VAD-gated pipeline (reference: sod-worker.cc, AccuProfile, Nnet::Write
checkpointing, OnlineVadFeaturePipeline)."""

import os
import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from kaldi_aslp_tpu.parallel.sod import (
    SodState,
    model_average_sync,
    sod_sync,
)
from kaldi_aslp_tpu.parallel import make_optimizer, OptimizerOptions
from kaldi_aslp_tpu.utils.profile import AccuProfiler, ThroughputMeter
from kaldi_aslp_tpu.train.checkpoint import load_checkpoint, \
    save_checkpoint
from kaldi_aslp_tpu.online.vad_pipeline import OnlineVadFeaturePipeline
from kaldi_aslp_tpu.online import OnlineFeatureOptions
from kaldi_aslp_tpu.vad import EnergyVad, VadOptions


def test_sod_sync_moves_toward_workers():
    params = {"w": jnp.zeros(4)}
    opt = make_optimizer(OptimizerOptions(optimizer="sgd", learn_rate=1.0))
    state = SodState(params, opt)
    avg = {"w": jnp.ones(4) * 2.0}   # workers drifted +2
    new_p, state = sod_sync(state, avg)
    # sgd lr=1 on "gradient" -(delta) → w += delta
    np.testing.assert_allclose(np.asarray(new_p["w"]), 2.0, atol=1e-6)
    # momentum optimizer accumulates across syncs
    state2 = SodState({"w": jnp.zeros(4)},
                      make_optimizer(OptimizerOptions(
                          optimizer="momentum", learn_rate=0.5,
                          momentum=0.5)))
    p2, state2 = sod_sync(state2, {"w": jnp.ones(4)})
    p3, state2 = sod_sync(state2, {"w": p2["w"] + 1.0})
    assert float(p3["w"][0]) > float(p2["w"][0])


def test_model_average():
    a = {"w": jnp.ones(3)}
    b = {"w": jnp.ones(3) * 3}
    avg = model_average_sync([a, b])
    np.testing.assert_allclose(np.asarray(avg["w"]), 2.0)


def test_accu_profiler():
    prof = AccuProfiler()
    with prof.region("fast"):
        time.sleep(0.01)
    with prof.region("slow"):
        time.sleep(0.03)
    with prof.region("fast"):
        time.sleep(0.01)
    rep = prof.report()
    assert "slow" in rep and "2 calls" in rep
    assert rep.index("slow") < rep.index("fast")  # sorted by time


def test_throughput_meter():
    m = ThroughputMeter()
    m.add_frames(1000)
    assert m.frames_per_sec > 0
    assert "audio-s/s" in m.report()


def test_checkpoint_roundtrip(tmp_path, rng):
    params = {"0": {"w": jnp.asarray(rng.randn(3, 4).astype(np.float32)),
                    "b": jnp.asarray(rng.randn(3).astype(np.float32))}}
    velocity = jax.tree_util.tree_map(lambda x: x * 0.1, params)
    states = {"1": {"count": jnp.asarray(5.0)}}
    path = str(tmp_path / "ckpt.zip")
    save_checkpoint(path, params, velocity, states,
                    meta={"iter": 3, "lr": 0.004})
    p, v, s, meta = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(p["0"]["w"]),
                                  np.asarray(params["0"]["w"]))
    np.testing.assert_allclose(np.asarray(v["0"]["b"]),
                               np.asarray(velocity["0"]["b"]))
    assert float(s["1"]["count"]) == 5.0
    assert meta == {"iter": 3, "lr": 0.004}


def test_vad_gated_pipeline(rng):
    pipe = OnlineVadFeaturePipeline(
        OnlineFeatureOptions(feature_type="fbank", num_mel_bins=23,
                             apply_cmn=False),
        EnergyVad(VadOptions(speech_trigger_ms=30,
                             silence_trigger_ms=50,
                             energy_threshold=8.0)),
    )
    sr = 16000
    quiet = (2 * rng.randn(sr // 2)).astype(np.float32)
    t = np.arange(sr // 2) / sr
    loud = (4000 * np.sin(2 * np.pi * 400 * t)).astype(np.float32)
    f1, b1 = pipe.accept_waveform(quiet)
    f2, b2 = pipe.accept_waveform(loud)
    f3, b3 = pipe.accept_waveform(quiet)
    assert len(f1) == 0            # leading silence dropped
    assert len(f2) > 10            # speech flows
    assert b3                      # boundary on speech→silence
