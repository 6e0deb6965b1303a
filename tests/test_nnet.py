"""Graph Nnet container tests (reference: src/aslp-nnet/nnet-nnet.cc —
chain + graph propagate, proto init, serialization, info)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kaldi_aslp_tpu.models import (
    AffineTransform,
    LossReporter,
    MultiTaskSpec,
    Nnet,
    Sigmoid,
    Softmax,
    Tanh,
    multitask_loss,
    mse_loss,
    xent_loss,
)

PROTO = """<NnetProto>
<AffineTransform> <InputDim> 10 <OutputDim> 16 <ParamStddev> 0.1
<Sigmoid> <InputDim> 16 <OutputDim> 16
<AffineTransform> <InputDim> 16 <OutputDim> 4 <ParamStddev> 0.1
<Softmax> <InputDim> 4 <OutputDim> 4
</NnetProto>"""


def test_proto_chain(rng):
    net = Nnet.from_proto(PROTO)
    assert net.num_components() == 4
    assert net.input_dim == 10 and net.output_dim == 4
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(7, 10).astype(np.float32))
    y, _ = net.apply(params, x)
    assert y.shape == (7, 4)
    np.testing.assert_allclose(np.asarray(y).sum(1), 1.0, rtol=1e-5)


def test_graph_add_junction(rng):
    """Two branches summed into one output (multi-input component,
    reference: nnet-nnet.cc:70-106)."""
    net = Nnet()
    a = net.add(AffineTransform(6, 8), inputs=[("in:0", 0)])
    b = net.add(AffineTransform(6, 8), inputs=[("in:0", 0)])
    net.add(Tanh(8, 8), inputs=[(a, 0), (b, 0)])  # add junction
    params = net.init(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.randn(3, 6).astype(np.float32))
    y, _ = net.apply(params, x)
    ya, _ = net.nodes[a].comp.apply(params["0"], x)
    yb, _ = net.nodes[b].comp.apply(params["1"], x)
    np.testing.assert_allclose(
        np.asarray(y), np.tanh(np.asarray(ya + yb)), rtol=1e-5, atol=1e-6
    )


def test_graph_splice_junction(rng):
    """Concat via column offsets (splice junction)."""
    net = Nnet()
    a = net.add(AffineTransform(6, 4), inputs=[("in:0", 0)])
    b = net.add(AffineTransform(6, 4), inputs=[("in:0", 0)])
    net.add(Tanh(8, 8), inputs=[(a, 0), (b, 4)])
    params = net.init(jax.random.PRNGKey(2))
    x = jnp.asarray(rng.randn(3, 6).astype(np.float32))
    y, _ = net.apply(params, x)
    ya, _ = net.nodes[a].comp.apply(params["0"], x)
    yb, _ = net.nodes[b].comp.apply(params["1"], x)
    np.testing.assert_allclose(
        np.asarray(y),
        np.tanh(np.concatenate([np.asarray(ya), np.asarray(yb)], -1)),
        rtol=1e-5, atol=1e-6,
    )


def test_multi_output(rng):
    """MIMO net: two heads (reference: aslp-nnet-train-frame-mimo.cc)."""
    net = Nnet()
    h = net.add(AffineTransform(5, 8), inputs=[("in:0", 0)])
    net.add(AffineTransform(8, 3), inputs=[(h, 0)])
    net.add(AffineTransform(8, 2), inputs=[(h, 0)])
    params = net.init(jax.random.PRNGKey(3))
    x = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    ys, _ = net.apply(params, x)
    assert isinstance(ys, list) and len(ys) == 2
    assert ys[0].shape == (4, 3) and ys[1].shape == (4, 2)
    assert net.output_dim == 5


def test_save_load_roundtrip(tmp_path, rng):
    net = Nnet.from_proto(PROTO)
    params = net.init(jax.random.PRNGKey(4))
    x = jnp.asarray(rng.randn(5, 10).astype(np.float32))
    y1, _ = net.apply(params, x)
    path = str(tmp_path / "model.knet")
    net.save(path, params)
    net2, params2, _ = Nnet.load(path)
    y2, _ = net2.apply(params2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)
    assert net2.info(params2) == net.info(params)


def test_info_and_dot():
    net = Nnet.from_proto(PROTO)
    info = net.info(net.init(jax.random.PRNGKey(0)))
    assert "num-components 4" in info
    assert "number-of-parameters" in info
    dot = net.to_dot()
    assert dot.startswith("digraph") and "n0 -> n1" in dot


def test_xent_loss_and_reporter(rng):
    logits = jnp.asarray(rng.randn(20, 5).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, 5, 20))
    loss, aux = xent_loss(logits, targets)
    # manual CE
    p = np.exp(np.asarray(logits))
    p /= p.sum(-1, keepdims=True)
    want = -np.log(p[np.arange(20), np.asarray(targets)]).mean()
    assert float(loss) == pytest.approx(want, rel=1e-5)
    rep = LossReporter("xent")
    rep.update(aux)
    out = rep.report()
    assert "AvgLoss:" in out and "FRAME_ACCURACY >>" in out


def test_mse_and_multitask(rng):
    out = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    tgt = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    loss, _ = mse_loss(out, tgt)
    want = 0.5 * ((np.asarray(out) - np.asarray(tgt)) ** 2).sum(1).mean()
    assert float(loss) == pytest.approx(want, rel=1e-5)

    spec = MultiTaskSpec.parse("multitask,xent,3,1.0,xent,4,0.5")
    assert spec.dims == [3, 4] and spec.scales == [1.0, 0.5]
    logits = jnp.asarray(rng.randn(10, 7).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, 3, (10, 2)))
    total, aux = multitask_loss(spec, logits, targets)
    assert float(total) > 0 and "task1_loss" in aux


def test_grad_through_nnet(rng):
    """End-to-end jax.grad through the DAG (replaces hand-written
    Backpropagate, reference: nnet-nnet.cc:108)."""
    net = Nnet.from_proto(PROTO.replace(
        "<Softmax> <InputDim> 4 <OutputDim> 4\n", ""
    ))
    params = net.init(jax.random.PRNGKey(5))
    x = jnp.asarray(rng.randn(6, 10).astype(np.float32))
    t = jnp.asarray(rng.randint(0, 4, 6))

    def loss_fn(p):
        y, _ = net.apply(p, x)
        l, _ = xent_loss(y, t)
        return l

    g = jax.grad(loss_fn)(params)
    norms = [float(jnp.abs(v).max())
             for v in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms)) and max(norms) > 0
