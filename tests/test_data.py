"""Data pipeline tests (reference: nnet-randomizer-test.cc pattern +
SequenceDataReader semantics of data-reader.cc)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.data.randomizer import FrameRandomizer, RandomizerOptions
from kaldi_aslp_tpu.data.sequence import (
    CtcBatcher,
    CtcBatcherOptions,
    SequenceDataReader,
    SequenceReaderOptions,
)


def test_randomizer_covers_all_frames(rng):
    opts = RandomizerOptions(randomizer_size=100, minibatch_size=16)
    r = FrameRandomizer(opts)
    total = 0
    seen = []
    for u in range(7):
        n = 30 + u
        feats = rng.randn(n, 4).astype(np.float32)
        targets = np.full(n, u, np.int32)
        r.feed(feats, targets)
        total += n
    for feats, targets in r.iterate_minibatches():
        assert feats.shape == (16, 4)
        seen.append(targets)
    for feats, targets in r.flush():
        seen.append(targets)
    got = np.concatenate(seen)
    assert len(got) == total
    # all utterances represented with correct counts
    counts = np.bincount(got, minlength=7)
    np.testing.assert_array_equal(counts, [30 + u for u in range(7)])


def test_randomizer_deterministic_seed(rng):
    a1, a2 = [], []
    for out in (a1, a2):
        r = FrameRandomizer(RandomizerOptions(minibatch_size=8))
        feats = np.arange(40, dtype=np.float32).reshape(40, 1)
        r.feed(feats, np.arange(40, dtype=np.int32))
        for _, t in r.flush():
            out.append(t)
    np.testing.assert_array_equal(np.concatenate(a1), np.concatenate(a2))


def _utts(rng, lengths, dim=3):
    for i, n in enumerate(lengths):
        yield (f"u{i}", rng.randn(n, dim).astype(np.float32),
               np.arange(n, dtype=np.int32) % 5)


def test_sequence_reader_chunks(rng):
    opts = SequenceReaderOptions(batch_size=10, num_streams=2,
                                 targets_delay=0)
    chunks = list(SequenceDataReader(_utts(rng, [25, 13, 8]), opts))
    # stream 0: u0 (25f → 3 chunks); stream 1: u1 (13f → 2 chunks) then u2
    assert chunks[0].new_utt_flags.tolist() == [1, 1]
    assert chunks[0].frame_mask.sum() == 20
    total_frames = sum(c.frame_mask.sum() for c in chunks)
    assert total_frames == 25 + 13 + 8
    # state reset flag fires when u2 replaces u1
    flag_events = sum(c.new_utt_flags.sum() for c in chunks)
    assert flag_events == 3


def test_sequence_reader_target_delay(rng):
    opts = SequenceReaderOptions(batch_size=50, num_streams=1,
                                 targets_delay=5)
    feats = np.arange(20, dtype=np.float32).reshape(20, 1).repeat(2, 1)
    targets = np.arange(20, dtype=np.int32)
    chunks = list(SequenceDataReader(iter([("u", feats, targets)]), opts))
    c = chunks[0]
    assert c.frame_mask.sum() == 25  # 20 + delay
    # prediction at t targets label t-5
    assert c.targets[0, 10] == 5
    # features beyond the end repeat the last frame
    assert c.feats[0, 22, 0] == 19


def test_sequence_reader_skip(rng):
    opts = SequenceReaderOptions(batch_size=50, num_streams=1,
                                 targets_delay=0, skip_width=2)
    feats = np.arange(10, dtype=np.float32).reshape(10, 1)
    targets = np.arange(10, dtype=np.int32)
    c = next(iter(SequenceDataReader(iter([("u", feats, targets)]), opts)))
    assert c.frame_mask.sum() == 5
    np.testing.assert_array_equal(c.feats[0, :5, 0], [0, 2, 4, 6, 8])


def test_sequence_reader_drop_len(rng):
    opts = SequenceReaderOptions(batch_size=10, num_streams=1, drop_len=15,
                                 targets_delay=0)
    reader = SequenceDataReader(_utts(rng, [25, 8]), opts)
    chunks = list(reader)
    assert reader.num_dropped == 1
    assert sum(c.frame_mask.sum() for c in chunks) == 8


def test_ctc_batcher(rng):
    opts = CtcBatcherOptions(num_streams=3, bucket_time=8, bucket_labels=4)
    def src():
        for i, (T, U) in enumerate([(20, 4), (15, 3), (11, 2), (30, 6)]):
            yield (f"u{i}", rng.randn(T, 5).astype(np.float32),
                   rng.randint(1, 9, U))
    batches = list(CtcBatcher(src(), opts))
    assert len(batches) == 2
    b = batches[0]
    assert b.feats.shape[0] == 3
    assert b.feats.shape[1] % 8 == 0
    assert b.labels.shape[1] % 4 == 0
    # sorted by length descending
    assert list(b.input_lengths) == sorted(b.input_lengths, reverse=True)
    np.testing.assert_array_equal(
        b.frame_mask.sum(1), b.input_lengths
    )


def test_ctc_batcher_drops_unalignable(rng):
    # T=5 < 2*U+1 with U=3 → dropped
    def src():
        yield ("bad", rng.randn(5, 2).astype(np.float32),
               np.array([1, 2, 3]))
        yield ("good", rng.randn(20, 2).astype(np.float32),
               np.array([1, 2, 3]))
    batcher = CtcBatcher(src(), CtcBatcherOptions(num_streams=4))
    batches = list(batcher)
    assert batcher.num_dropped == 1
    assert batches[0].keys == ["good"]


def test_device_prefetcher_order_and_errors():
    from kaldi_aslp_tpu.data.prefetch import DevicePrefetcher

    out = list(DevicePrefetcher(range(10), depth=3,
                                transform=lambda x: x * 2))
    assert out == [2 * i for i in range(10)]

    def bad():
        yield 1
        raise ValueError("boom")

    it = DevicePrefetcher(bad())
    assert next(it) == 1
    import pytest
    with pytest.raises(ValueError, match="boom"):
        next(it)
