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
