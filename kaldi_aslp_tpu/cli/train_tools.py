"""Training CLI tools (reference: src/aslp-nnetbin/ —
aslp-nnet-train-simple.cc:31-371 frame CE/MSE trainer with randomizer,
aslp-nnet-train-ctc-streams.cc CTC stream trainer,
aslp-nnet-train-lstm-streams.cc BPTT chunk trainer)."""

from __future__ import annotations

import dataclasses
import sys

import numpy as np
import jax

from kaldi_aslp_tpu.utils.config import Config, parse_options
from kaldi_aslp_tpu.utils.log import get_logger, Timer
from kaldi_aslp_tpu.io import (
    random_access_int_vector_reader,
    sequential_matrix_reader,
)
from kaldi_aslp_tpu.models import Nnet
from kaldi_aslp_tpu.models.losses import LossReporter
from kaldi_aslp_tpu.train import (
    CtcTrainer,
    FrameTrainer,
    NnetTrainOptions,
    init_velocity,
)
from kaldi_aslp_tpu.data.randomizer import FrameRandomizer, \
    RandomizerOptions
from kaldi_aslp_tpu.data.sequence import (
    CtcBatcher,
    CtcBatcherOptions,
    SequenceDataReader,
    SequenceReaderOptions,
)

logger = get_logger("train-cli")


@dataclasses.dataclass
class TrainerFlags(Config):
    learn_rate: float = 0.008
    momentum: float = 0.0
    l1_penalty: float = 0.0
    l2_penalty: float = 0.0
    cross_validate: bool = False
    objective_function: str = "xent"
    seed: int = 777


def _source(feats_rspec, targets_rspec):
    targets = random_access_int_vector_reader(targets_rspec)
    for utt, feats in sequential_matrix_reader(feats_rspec):
        if utt not in targets:
            logger.warning("no targets for %s, skipping", utt)
            continue
        tgt = np.asarray(targets[utt])
        n = min(len(feats), len(tgt))
        yield utt, feats[:n], tgt[:n]


def nnet_train_simple(argv):
    """(reference: aslp-nnet-train-simple.cc)."""
    flags = TrainerFlags()
    ropts = RandomizerOptions()
    args = parse_options(
        argv, [flags, ropts],
        "aslp-nnet-train-simple feats-rspec targets-rspec model-in "
        "[model-out]",
        3, 4,
    )
    net, params, states = Nnet.load(args[2])
    trainer = FrameTrainer(
        net,
        NnetTrainOptions(learn_rate=flags.learn_rate,
                         momentum=flags.momentum,
                         l1_penalty=flags.l1_penalty,
                         l2_penalty=flags.l2_penalty),
        objective=flags.objective_function,
    )
    timer = Timer()
    if flags.cross_validate:
        def batches():
            r = FrameRandomizer(ropts)
            for _, f, t in _source(args[0], args[1]):
                r.feed(f, t)
                if r.full():
                    yield from r.iterate_minibatches()
            yield from r.flush()
        rep = trainer.evaluate(params, batches())
    else:
        velocity = init_velocity(params)
        def batches():
            r = FrameRandomizer(ropts)
            for _, f, t in _source(args[0], args[1]):
                r.feed(f, t)
                if r.full():
                    yield from r.iterate_minibatches()
            yield from r.flush()
        params, velocity, rep = trainer.train_epoch(
            params, velocity, batches(), flags.learn_rate
        )
        if len(args) > 3:
            net.save(args[3], params, states)
    print(rep.report())
    logger.info("done in %.1fs (%s)", timer.elapsed(),
                "CV" if flags.cross_validate else "train")
    return 0


def nnet_train_frame_mimo(argv):
    """MIMO frame trainer (reference:
    aslp-nnetbin/aslp-nnet-train-frame-mimo.cc): positional args are
    N feature rspecifiers + M target rspecifiers + model-in
    [+ model-out unless --cross-validate], with N/M validated against
    the net's input/output arity (:82-94).  --objective-function is
    colon-separated per output head, e.g. "xent:mse", and its length
    must equal the number of outputs (:104-111).  xent heads read int
    alignment targets; mse heads read matrix targets."""
    flags = TrainerFlags()
    ropts = RandomizerOptions()
    args = parse_options(
        argv, [flags, ropts],
        "aslp-nnet-train-frame-mimo feats-rspec-1..N targets-rspec-1..M "
        "model-in [model-out]", 2, 66,
    )
    extra = 1 if flags.cross_validate else 2
    model_in = args[-extra]
    net, params, model_states = Nnet.load(model_in)
    n_in, out_ids = net.num_inputs, net.output_ids()
    n_out = len(out_ids)
    if len(args) != n_in + n_out + extra:
        print(f"aslp-nnet-train-frame-mimo: net has {n_in} input(s) / "
              f"{n_out} output(s); expected {n_in + n_out + extra} args, "
              f"got {len(args)}", file=sys.stderr)
        return 1
    objectives = flags.objective_function.split(":")
    if len(objectives) != n_out:
        print(f"aslp-nnet-train-frame-mimo: --objective-function needs "
              f"{n_out} colon-separated entries, got "
              f"{flags.objective_function!r}", file=sys.stderr)
        return 1
    for obj in objectives:
        if obj not in ("xent", "mse"):
            print(f"unknown objective {obj!r}", file=sys.stderr)
            return 1
    feat_specs = args[:n_in]
    tgt_specs = args[n_in:n_in + n_out]

    import jax.numpy as jnp
    from kaldi_aslp_tpu.io import random_access_matrix_reader
    from kaldi_aslp_tpu.models.losses import mse_loss, xent_loss
    from kaldi_aslp_tpu.train.sgd import make_sgd_update

    tgt_readers = [
        (random_access_int_vector_reader(spec) if obj == "xent"
         else random_access_matrix_reader(spec))
        for spec, obj in zip(tgt_specs, objectives)
    ]

    def utterances():
        """Lockstep over the N sequential feature readers; targets by
        random access (mirrors the reference's reader fan-in)."""
        feat_iters = [sequential_matrix_reader(s) for s in feat_specs]
        for items in zip(*feat_iters):
            utt = items[0][0]
            if any(u != utt for u, _ in items[1:]):
                raise RuntimeError(
                    f"feature key mismatch at {utt} — check scp order")
            if any(utt not in r for r in tgt_readers):
                logger.warning("no targets for %s, skipping", utt)
                continue
            feats = [np.asarray(m, np.float32) for _, m in items]
            tgts = [np.asarray(r[utt]) for r in tgt_readers]
            n = min(min(len(f) for f in feats),
                    min(len(t) for t in tgts))
            yield ([f[:n] for f in feats], [t[:n] for t in tgts])

    opts = NnetTrainOptions(learn_rate=flags.learn_rate,
                            momentum=flags.momentum,
                            l1_penalty=flags.l1_penalty,
                            l2_penalty=flags.l2_penalty)
    update = make_sgd_update(net, opts)

    def multi_loss(p, feats_list, tgt_list, w, rng, train):
        ys, _ = net.apply(p, feats_list if n_in > 1 else feats_list[0],
                          train=train, rng=rng)
        if not isinstance(ys, list):
            ys = [ys]
        total = 0.0
        auxes = []
        for y, t, obj in zip(ys, tgt_list, objectives):
            fn = xent_loss if obj == "xent" else mse_loss
            l, aux = fn(y, t, w)
            total = total + l
            auxes.append(aux)
        return total, auxes

    @jax.jit
    def step(params, velocity, feats_list, tgt_list, w, lr, rng):
        (loss, auxes), grads = jax.value_and_grad(
            lambda p: multi_loss(p, feats_list, tgt_list, w, rng, True),
            has_aux=True)(params)
        params, velocity = update(params, grads, velocity, lr)
        return params, velocity, auxes

    @jax.jit
    def evaluate(params, feats_list, tgt_list, w):
        _, auxes = multi_loss(params, feats_list, tgt_list, w, None,
                              False)
        return auxes

    def minibatches():
        r = FrameRandomizer(ropts)
        for feats, tgts in utterances():
            r.feed(*feats, *tgts)
            if r.full():
                yield from r.iterate_minibatches()
        yield from r.flush()

    reporters = [LossReporter(obj) for obj in objectives]
    velocity = init_velocity(params)
    lr = jnp.asarray(flags.learn_rate, jnp.float32)
    base_rng = jax.random.PRNGKey(flags.seed)
    n_batches = 0
    for batch in minibatches():
        feats_list = [jnp.asarray(a, jnp.float32) for a in batch[:n_in]]
        tgt_list = [
            jnp.asarray(a, jnp.int32 if obj == "xent" else jnp.float32)
            for a, obj in zip(batch[n_in:], objectives)
        ]
        w = jnp.ones(len(batch[0]), jnp.float32)
        if flags.cross_validate:
            auxes = evaluate(params, feats_list, tgt_list, w)
        else:
            n_batches += 1
            rng = jax.random.fold_in(base_rng, n_batches)
            params, velocity, auxes = step(
                params, velocity, feats_list, tgt_list, w, lr, rng)
        for rep, aux in zip(reporters, auxes):
            rep.update(aux)
    for i, rep in enumerate(reporters):
        print(f"[output {i}] {rep.report()}")
    if not flags.cross_validate:
        net.save(args[-1], params, model_states)
    return 0


def nnet_train_ctc_streams(argv):
    """(reference: aslp-nnet-train-ctc-streams.cc)."""
    flags = TrainerFlags()
    bopts = CtcBatcherOptions()
    args = parse_options(
        argv, [flags, bopts],
        "aslp-nnet-train-ctc-streams feats-rspec labels-rspec model-in "
        "[model-out]",
        3, 4,
    )
    net, params, states = Nnet.load(args[2])
    trainer = CtcTrainer(
        net,
        NnetTrainOptions(learn_rate=flags.learn_rate,
                         momentum=flags.momentum),
    )
    batches = list(CtcBatcher(_source(args[0], args[1]), bopts))
    if flags.cross_validate:
        rep = trainer.evaluate(params, batches)
    else:
        velocity = init_velocity(params)
        params, velocity, rep = trainer.train_epoch(
            params, velocity, batches, flags.learn_rate
        )
        if len(args) > 3:
            net.save(args[3], params, states)
    print(rep.report())
    return 0


def nnet_train_lstm_streams(argv):
    """BPTT chunk trainer (reference: aslp-nnet-train-lstm-streams.cc):
    multi-stream chunks with carried state + frame-level CE targets."""
    flags = TrainerFlags()
    sopts = SequenceReaderOptions()
    args = parse_options(
        argv, [flags, sopts],
        "aslp-nnet-train-lstm-streams feats-rspec targets-rspec model-in "
        "[model-out]",
        3, 4,
    )
    import jax.numpy as jnp
    from kaldi_aslp_tpu.models.losses import xent_loss
    from kaldi_aslp_tpu.train.sgd import make_sgd_update

    net, params, model_states = Nnet.load(args[2])
    opts = NnetTrainOptions(learn_rate=flags.learn_rate,
                            momentum=flags.momentum)
    update = make_sgd_update(net, opts)
    velocity = init_velocity(params)
    reporter = LossReporter("xent")

    @jax.jit
    def step(params, velocity, states, feats, targets, mask, flags_arr,
             lr):
        # reset stream state where a new utterance begins
        def reset(s):
            return jax.tree_util.tree_map(
                lambda v: v * (1.0 - flags_arr)[:, None]
                if v.ndim == 2 else v, s
            )
        states = {k: reset(v) for k, v in states.items()}

        def loss_fn(p):
            y, new_states = net.apply(p, feats, states=states,
                                      train=True, mask=mask)
            l, aux = xent_loss(y, targets, mask)
            return l, (aux, new_states)
        (l, (aux, new_states)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        params, velocity = update(params, grads, velocity, lr)
        return params, velocity, new_states, aux

    reader = SequenceDataReader(_source(args[0], args[1]), sopts)
    states = net.init_state(sopts.num_streams)
    lr = np.float32(flags.learn_rate)
    for chunk in reader:
        params, velocity, states, aux = step(
            params, velocity, states,
            jnp.asarray(chunk.feats), jnp.asarray(chunk.targets),
            jnp.asarray(chunk.frame_mask),
            jnp.asarray(chunk.new_utt_flags, jnp.float32), lr,
        )
        reporter.update(aux)
    if len(args) > 3 and not flags.cross_validate:
        net.save(args[3], params, model_states)
    print(reporter.report())
    return 0
