"""HBM-resident epoch cache (data/device_cache.py).

Pins: replay epochs see the same device batches (training with a cache
matches epoch-wise streaming exactly when shuffle is off), per-epoch
order shuffling is deterministic and a permutation, max_bytes bounds the
cache with a graceful streamed tail, and misuse raises.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaldi_aslp_tpu.data.device_cache import DeviceEpochCache
from kaldi_aslp_tpu.data.sequence import CtcBatcher, CtcBatcherOptions
from kaldi_aslp_tpu.models.nnet import Nnet
from kaldi_aslp_tpu.models.simple import AffineTransform
from kaldi_aslp_tpu.train import NnetTrainOptions, init_velocity
from kaldi_aslp_tpu.train.trainer import CtcTrainer


def _upload_counting(counter):
    def upload(b):
        counter[0] += 1
        return (jnp.asarray(np.asarray(b, np.float32)),)
    return upload


def test_first_epoch_streams_then_replays_without_uploads():
    counter = [0]
    cache = DeviceEpochCache(_upload_counting(counter), shuffle=False)
    data = [np.full((2, 2), i) for i in range(5)]
    first = [np.asarray(t[0]) for t in cache.epoch(iter(data))]
    assert counter[0] == 5 and len(first) == 5
    second = [np.asarray(t[0]) for t in cache.epoch()]
    assert counter[0] == 5  # no new uploads
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_shuffle_is_deterministic_permutation():
    cache = DeviceEpochCache(lambda b: (jnp.asarray(b),), shuffle=True,
                             seed=3)
    data = [np.full((1,), i, np.float32) for i in range(8)]
    list(cache.epoch(iter(data)))
    e2 = [int(t[0][0]) for t in cache.epoch()]
    e3 = [int(t[0][0]) for t in cache.epoch()]
    assert sorted(e2) == list(range(8)) and sorted(e3) == list(range(8))
    assert e2 != list(range(8)) or e3 != list(range(8))
    # a fresh cache with the same seed replays the same order
    cache2 = DeviceEpochCache(lambda b: (jnp.asarray(b),), shuffle=True,
                              seed=3)
    list(cache2.epoch(iter(data)))
    assert [int(t[0][0]) for t in cache2.epoch()] == e2


def test_max_bytes_bounds_cache_with_streamed_tail():
    counter = [0]
    item_bytes = 2 * 2 * 4
    cache = DeviceEpochCache(_upload_counting(counter),
                             max_bytes=3 * item_bytes, shuffle=False)
    data = [np.full((2, 2), i) for i in range(5)]
    assert len(list(cache.epoch(iter(data)))) == 5
    assert cache.bytes_cached == 3 * item_bytes
    assert cache.num_streamed_tail == 2
    out = [int(np.asarray(t[0])[0, 0]) for t in cache.epoch(iter(data))]
    assert out == [0, 1, 2, 3, 4]
    assert counter[0] == 5 + 2  # tail re-uploaded once per replay epoch
    with pytest.raises(ValueError):
        list(cache.epoch())  # tail exists but no source given


def test_replay_without_fill_raises():
    cache = DeviceEpochCache(lambda b: b)
    with pytest.raises(ValueError):
        list(cache.epoch())


def test_trainer_cached_epochs_match_streaming():
    rs = np.random.RandomState(0)
    D, V, S, T, U = 5, 6, 4, 20, 3
    utts = [(f"u{i}", rs.randn(int(rs.randint(12, T + 1)), D)
             .astype(np.float32),
             rs.randint(1, V, int(rs.randint(2, U + 1))).astype(np.int32))
            for i in range(8)]
    opts = CtcBatcherOptions(num_streams=S, bucket_time=T, bucket_labels=U,
                             frame_limit=10 ** 9, sort_by_length=False)

    def run(use_cache):
        net = Nnet()
        net.add(AffineTransform(D, V))
        trainer = CtcTrainer(net, NnetTrainOptions(momentum=0.9),
                             transport="bf16")
        params = net.init(jax.random.PRNGKey(0))
        velocity = init_velocity(params)
        cache = trainer.make_cache(shuffle=False) if use_cache else None
        losses = []
        for _ in range(3):
            batches = iter(list(CtcBatcher(iter(utts), opts)))
            params, velocity, rep = trainer.train_epoch(
                params, velocity, batches, 0.01, cache=cache)
            losses.append(rep.avg_loss)
        return losses, params

    l_stream, p_stream = run(False)
    l_cache, p_cache = run(True)
    assert l_cache == pytest.approx(l_stream, rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_stream),
                    jax.tree_util.tree_leaves(p_cache)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6)


def test_max_bytes_replay_keeps_positions_with_interleaved_sizes():
    # a big batch in the MIDDLE overflows max_bytes; later small ones
    # still cache — replay must keep stream positions straight (the
    # round-2 review found b1 dropped / b2 duplicated here)
    counter = [0]
    cache = DeviceEpochCache(_upload_counting(counter),
                             max_bytes=3 * 4 * 4, shuffle=False)
    data = [np.full((2, 2), 0.0), np.full((40, 2), 1.0),
            np.full((2, 2), 2.0), np.full((2, 2), 3.0)]
    list(cache.epoch(iter(data)))
    assert cache.num_streamed_tail == 1  # only the big one streamed
    out = [float(np.asarray(t[0]).ravel()[0])
           for t in cache.epoch(iter(data))]
    assert sorted(out) == [0.0, 1.0, 2.0, 3.0]
    assert out[:3] == [0.0, 2.0, 3.0]  # cached prefix in cache order
    assert out[3] == 1.0               # streamed tail re-uploaded


def test_aborted_fill_epoch_rolls_back():
    counter = [0]
    cache = DeviceEpochCache(_upload_counting(counter), shuffle=False)
    data = [np.full((2, 2), i) for i in range(5)]
    it = cache.epoch(iter(data))
    next(it); next(it)
    it.close()  # consumer abandons the epoch mid-way
    assert not cache.filled and cache.bytes_cached == 0
    # a retry fills cleanly with no duplicated prefix
    assert len(list(cache.epoch(iter(data)))) == 5
    assert cache.filled
    assert len(list(cache.epoch())) == 5


def test_aborted_fill_epoch_on_exception_rolls_back():
    cache = DeviceEpochCache(lambda b: (jnp.asarray(b),), shuffle=False)

    def bad_source():
        yield np.zeros((2, 2), np.float32)
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        list(cache.epoch(bad_source()))
    assert not cache.filled and cache.bytes_cached == 0


def test_native_pad_pack_rejects_bad_shapes():
    from kaldi_aslp_tpu import native
    good = np.zeros((3, 4), np.float32)
    with pytest.raises(ValueError):
        native.pad_pack([good, np.zeros((3, 5), np.float32)], 8, "f32")
    with pytest.raises(ValueError):
        native.pad_pack([np.zeros((9, 4), np.float32)], 8, "f32")
