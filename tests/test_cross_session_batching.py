"""Cross-session acoustic batching tests (reference: the
max_nnet_batch_size idea of src/aslp-online/online-nnet-decoder.h:30-45
generalized across concurrent sessions)."""

import asyncio

import numpy as np
import pytest

from kaldi_aslp_tpu.online import AcousticBatcher


def _forward(calls):
    def fn(x, mask):
        calls.append(x.shape)
        # toy "acoustic model": per-frame scores = cumulative sums so
        # results depend on the session's own features only
        return x.cumsum(axis=1)[:, :, :4]
    return fn


def test_batcher_coalesces_concurrent_requests():
    calls = []
    batcher = AcousticBatcher(_forward(calls), max_batch=8,
                              max_wait_ms=10.0, t_bucket=8)

    async def session(i, T):
        feats = np.full((T, 6), float(i), np.float32)
        out = await batcher.compute(feats)
        assert out.shape == (T, 4)
        # row t of cumsum = (t+1) * i in every dim
        np.testing.assert_allclose(out[:, 0],
                                   (np.arange(T) + 1) * float(i))
        return i

    async def main():
        return await asyncio.gather(*[
            session(i + 1, T) for i, T in enumerate([5, 9, 3, 8])])

    got = asyncio.run(main())
    assert got == [1, 2, 3, 4]
    # all four requests shared ONE padded forward
    assert batcher.num_batches == 1
    assert calls[0] == (4, 16, 6)  # padded to t_bucket multiple


def test_batcher_respects_max_batch():
    calls = []
    batcher = AcousticBatcher(_forward(calls), max_batch=2,
                              max_wait_ms=50.0, t_bucket=4)

    async def main():
        return await asyncio.gather(*[
            batcher.compute(np.ones((4, 6), np.float32))
            for _ in range(5)])

    outs = asyncio.run(main())
    assert len(outs) == 5
    assert batcher.num_batches >= 3  # 2 + 2 + 1


def test_batcher_propagates_errors():
    def bad(x, mask):
        raise ValueError("boom")

    batcher = AcousticBatcher(bad, max_batch=2, max_wait_ms=1.0)

    async def main():
        with pytest.raises(ValueError):
            await batcher.compute(np.ones((4, 6), np.float32))

    asyncio.run(main())
