"""Layer-wise discriminative pretraining (reference:
aslp_scripts/aslp_nnet/pretrain.sh, aslp-nnetbin/aslp-nnet-insert.cc)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaldi_aslp_tpu.models import AffineTransform, Sigmoid, Softmax
from kaldi_aslp_tpu.models.nnet import Nnet
from kaldi_aslp_tpu.train import (
    FrameTrainer,
    NnetTrainOptions,
    init_velocity,
    insert_components,
    last_updatable_index,
    pretrain_layerwise,
)


def _chain(*comps):
    net = Nnet()
    for c in comps:
        net.add(c)
    return net


def _hidden(in_dim, out_dim):
    return [
        AffineTransform(in_dim, out_dim, param_stddev=0.1,
                        bias_mean=0.0, bias_range=0.0),
        Sigmoid(out_dim, out_dim),
    ]


def test_last_updatable_index():
    net = _chain(*_hidden(4, 8),
                 AffineTransform(8, 3, param_stddev=0.1,
                                 bias_mean=0.0, bias_range=0.0),
                 Softmax(3, 3))
    assert last_updatable_index(net) == 2


def test_insert_before_last_updatable_and_randomize():
    base = _chain(*_hidden(4, 8),
                  AffineTransform(8, 3, param_stddev=0.1,
                                  bias_mean=0.0, bias_range=0.0))
    bp = base.init(jax.random.PRNGKey(1))
    ins = _chain(*_hidden(8, 8))
    ip = ins.init(jax.random.PRNGKey(2))
    out, op = insert_components(base, bp, ins, ip,
                                key=jax.random.PRNGKey(3))
    # structure: Affine Sigmoid [Affine Sigmoid] Affine
    assert [n.comp.token for n in out.nodes] == [
        "<AffineTransform>", "<Sigmoid>",
        "<AffineTransform>", "<Sigmoid>", "<AffineTransform>"]
    # inserted params preserved
    np.testing.assert_array_equal(op["2"]["w"], ip["0"]["w"])
    # leading params preserved
    np.testing.assert_array_equal(op["0"]["w"], bp["0"]["w"])
    # output affine re-randomized with stddev 0.1/sqrt(8)
    w = np.asarray(op["4"]["w"])
    assert not np.array_equal(w, np.asarray(bp["2"]["w"]))
    assert abs(w.std() - 0.1 / np.sqrt(8)) < 0.02
    # forward runs at the new depth
    y, _ = out.apply(op, jnp.ones((2, 5, 4)))
    assert y.shape == (2, 5, 3)


def test_insert_no_randomize_keeps_params():
    base = _chain(*_hidden(4, 8),
                  AffineTransform(8, 3, param_stddev=0.1,
                                  bias_mean=0.0, bias_range=0.0))
    bp = base.init(jax.random.PRNGKey(1))
    ins = _chain(*_hidden(8, 8))
    ip = ins.init(jax.random.PRNGKey(2))
    _, op = insert_components(base, bp, ins, ip, randomize_next=False)
    np.testing.assert_array_equal(op["4"]["w"], bp["2"]["w"])


def test_insert_rejects_non_affine_next():
    base = _chain(*_hidden(4, 8), Softmax(8, 8))
    bp = base.init(jax.random.PRNGKey(1))
    ins = _chain(Softmax(8, 8))
    ip = ins.init(jax.random.PRNGKey(2))
    # last updatable is the hidden affine at 0; next after the insert
    # is the Sigmoid → not an updatable affine
    with pytest.raises(ValueError):
        insert_components(base, bp, ins, ip, insert_at=1)


def test_pretrain_layerwise_grows_and_learns():
    """Pretrain a 3-hidden-layer DNN on a separable toy frame task;
    the grown net must keep improving (pretrain.sh's whole point)."""
    rs = np.random.RandomState(0)
    D, V, N = 10, 4, 2048
    centers = rs.randn(V, D) * 2.0
    targets = rs.randint(0, V, N)
    feats = centers[targets] + rs.randn(N, D) * 0.5

    def batches():
        for i in range(0, N, 256):
            f = jnp.asarray(feats[i:i + 256].astype(np.float32))
            t = jnp.asarray(targets[i:i + 256].astype(np.int32))
            yield f, t, jnp.ones((len(f),), jnp.float32)

    losses = {}

    def train_fn(net, params, depth):
        trainer = FrameTrainer(net, NnetTrainOptions(momentum=0.5))
        velocity = init_velocity(params)
        for _ in range(6):
            params, velocity, rep = trainer.train_epoch(
                params, velocity, batches(), 1.0)
        losses[depth] = rep.avg_loss
        return params

    initial = _chain(*_hidden(D, 16),
                     AffineTransform(16, V, param_stddev=0.04,
                                     bias_mean=0.0, bias_range=0.0))
    net, params = pretrain_layerwise(
        initial, lambda d: _chain(*_hidden(16, 16)), 3, train_fn,
        key=jax.random.PRNGKey(0))
    assert len(net.nodes) == 3 * 2 + 1
    assert sorted(losses) == [1, 2, 3]
    # each depth trains to a sane loss (random = log 4 ≈ 1.39)
    assert losses[3] < 0.3
    ev = FrameTrainer(net, NnetTrainOptions()).evaluate(
        params, batches())
    assert ev.frame_accuracy > 80.0


def test_nnet_insert_cli_default_position(tmp_path):
    from kaldi_aslp_tpu.cli.nnet_tools import nnet_init, nnet_insert
    proto_a = tmp_path / "a.proto"
    proto_a.write_text(
        "<NnetProto>\n"
        "<AffineTransform> <InputDim> 4 <OutputDim> 6\n"
        "<Sigmoid> <InputDim> 6 <OutputDim> 6\n"
        "<AffineTransform> <InputDim> 6 <OutputDim> 3\n"
        "</NnetProto>\n")
    proto_b = tmp_path / "b.proto"
    proto_b.write_text(
        "<NnetProto>\n"
        "<AffineTransform> <InputDim> 6 <OutputDim> 6\n"
        "<Sigmoid> <InputDim> 6 <OutputDim> 6\n"
        "</NnetProto>\n")
    assert nnet_init([str(proto_a), f"{tmp_path}/a.knet"]) == 0
    assert nnet_init([str(proto_b), f"{tmp_path}/b.knet"]) == 0
    assert nnet_insert([f"{tmp_path}/a.knet", f"{tmp_path}/b.knet",
                        f"{tmp_path}/out.knet"]) == 0
    net, params, _ = Nnet.load(f"{tmp_path}/out.knet")
    assert [n.comp.token for n in net.nodes] == [
        "<AffineTransform>", "<Sigmoid>",
        "<AffineTransform>", "<Sigmoid>", "<AffineTransform>"]


def test_hybrid_recipe_pretrain_path(tmp_path):
    """The pretrain_iters option produces a full-depth net through the
    growth path and still reaches a WER (smoke, tiny task)."""
    from tests.test_recipes import _lang, _corpus
    from kaldi_aslp_tpu.recipes.hybrid import (
        HybridRecipe, HybridRecipeOptions)

    rng = np.random.RandomState(7)
    lang = _lang()
    trf, trt = _corpus(rng, 16)
    tef, tet = _corpus(rng, 4)
    opts = HybridRecipeOptions(
        model_type="dnn", hidden_dim=32, num_layers=2,
        splice_context=1, learn_rate=0.2, max_iters=4,
        pretrain_iters=2, pretrain_learn_rate=0.2,
        minibatch_size=64, mono_iters=5, mono_totgauss=40,
        acoustic_scale=1.0)
    recipe = HybridRecipe(lang, opts)
    stats = recipe.run(trf, trt, tef, tet,
                       work_dir=str(tmp_path / "exp"))
    assert stats.wer <= 15.0, stats.report()
