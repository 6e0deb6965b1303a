"""Benchmark harness: prints ONE JSON line with the primary metric.

Primary metric (BASELINE.json): audio-seconds/s/chip for flagship
BLSTM-CTC *training* (forward+CTC+backward+update) at 10ms frame shift.

vs_baseline: the reference publishes no throughput numbers
(BASELINE.md); the denominator is an estimated reference throughput of
25 audio-s/s per device — a K40-era GPU LSTM trainer at ~2.5k frames/s
(the reference's own fps logs, aslp-nnet-train-simple.cc:246-249, on the
machine.conf cluster hardware).  The north-star target is >=10x.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_AUDIO_SECONDS_PER_SEC = 25.0  # estimated reference GPU throughput
FRAME_SHIFT_S = 0.01


def main():
    import jax
    import jax.numpy as jnp

    from kaldi_aslp_tpu.models.flagship import build_blstm_ctc
    from kaldi_aslp_tpu.models.losses import ctc_batch_loss
    from kaldi_aslp_tpu.train import (
        NnetTrainOptions,
        init_velocity,
        make_sgd_update,
    )

    S, T, U, D, V = 128, 400, 40, 40, 72
    from kaldi_aslp_tpu.models.nnet import Nnet
    from kaldi_aslp_tpu.models.simple import AffineTransform
    from kaldi_aslp_tpu.models.recurrent import BLstmProjectedStreams

    net = Nnet()
    dim = D
    for _ in range(3):
        net.add(BLstmProjectedStreams(dim, 640, cell_dim=512, bf16=True))
        dim = 640
    net.add(AffineTransform(dim, V, param_stddev=0.04, bias_mean=0.0,
                            bias_range=0.0))
    params = net.init(jax.random.PRNGKey(0))
    velocity = init_velocity(params)
    update = make_sgd_update(net, NnetTrainOptions(momentum=0.9))

    rs = np.random.RandomState(0)
    feats = jnp.asarray(rs.randn(S, T, D).astype(np.float32))
    labels = jnp.asarray(rs.randint(1, V, (S, U)).astype(np.int32))
    in_lens = jnp.asarray(np.full(S, T, np.int32))
    lab_lens = jnp.asarray(np.full(S, U, np.int32))
    mask = jnp.ones((S, T), jnp.float32)
    lr = jnp.asarray(0.0001, jnp.float32)

    @jax.jit
    def step(params, velocity, feats):
        def loss_fn(p):
            y, _ = net.apply(p, feats, train=True, mask=mask)
            return ctc_batch_loss(y, labels, in_lens, lab_lens)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, velocity = update(params, grads, velocity, lr)
        return params, velocity, loss

    # warmup / compile
    params, velocity, loss = step(params, velocity, feats)
    jax.block_until_ready(loss)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        params, velocity, loss = step(params, velocity, feats)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    audio_seconds = n_iters * S * T * FRAME_SHIFT_S
    throughput = audio_seconds / dt
    print(json.dumps({
        "metric": "audio-seconds/s/chip (BLSTM-CTC train)",
        "value": round(throughput, 2),
        "unit": "audio-s/s",
        "vs_baseline": round(throughput / REF_AUDIO_SECONDS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
