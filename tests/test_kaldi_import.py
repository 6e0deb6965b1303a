"""Reference .nnet import/export tests (format per src/aslp-nnet/
nnet-component.cc:328-343 and component WriteData headers)."""

import io

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kaldi_aslp_tpu.io import kaldi_io
from kaldi_aslp_tpu.models import Nnet
from kaldi_aslp_tpu.models.kaldi_import import (
    read_kaldi_nnet,
    write_kaldi_nnet_standard,
)

PROTO = """<NnetProto>
<AffineTransform> <InputDim> 10 <OutputDim> 16 <ParamStddev> 0.1
<Sigmoid> <InputDim> 16 <OutputDim> 16
<LstmProjectedStreams> <InputDim> 16 <OutputDim> 8 <CellDim> 12
<AffineTransform> <InputDim> 8 <OutputDim> 4 <ParamStddev> 0.1
<Softmax> <InputDim> 4 <OutputDim> 4
</NnetProto>"""


def test_standard_roundtrip(rng):
    net = Nnet.from_proto(PROTO)
    params = net.init(jax.random.PRNGKey(0))
    buf = io.BytesIO()
    write_kaldi_nnet_standard(buf, net, params)
    buf.seek(0)
    net2, params2 = read_kaldi_nnet(buf)
    assert net2.num_components() == 5
    x = jnp.asarray(rng.randn(1, 7, 10).astype(np.float32))
    y1, _ = net.apply(params, x)
    y2, _ = net2.apply(params2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-6)


def test_graph_format_with_ids(rng):
    """Hand-assemble a graph-format .nnet (id + input/offset vectors,
    reference: Component::Write) and check the DAG edges import."""
    buf = io.BytesIO()
    buf.write(kaldi_io.BINARY_MARKER)
    kaldi_io.write_token(buf, "<Nnet>")

    def write_comp(token, out_d, in_d, cid, inputs, offsets, payload):
        kaldi_io.write_token(buf, token)
        kaldi_io.write_basic_int32(buf, out_d)
        kaldi_io.write_basic_int32(buf, in_d)
        kaldi_io.write_basic_int32(buf, cid)
        kaldi_io.write_int_vector(buf, np.asarray(inputs, np.int32))
        kaldi_io.write_int_vector(buf, np.asarray(offsets, np.int32))
        payload()

    rngs = np.random.RandomState(0)
    w1 = rngs.randn(6, 4).astype(np.float32)
    b1 = rngs.randn(6).astype(np.float32)

    def affine_payload():
        kaldi_io.write_token(buf, "<LearnRateCoef>")
        kaldi_io.write_basic_float(buf, 1.0)
        kaldi_io.write_token(buf, "<BiasLearnRateCoef>")
        kaldi_io.write_basic_float(buf, 2.0)
        kaldi_io.write_token(buf, "<MaxNorm>")
        kaldi_io.write_basic_float(buf, 0.0)
        kaldi_io.write_matrix(buf, w1)
        kaldi_io.write_vector(buf, b1)

    write_comp("<AffineTransform>", 6, 4, cid=1, inputs=[-1],
               offsets=[0], payload=affine_payload)
    write_comp("<Sigmoid>", 6, 6, cid=2, inputs=[1], offsets=[0],
               payload=lambda: None)
    kaldi_io.write_token(buf, "</Nnet>")

    buf.seek(0)
    net, params = read_kaldi_nnet(buf)
    assert net.num_components() == 2
    assert net.nodes[1].inputs == [(0, 0)]  # id 1 remapped to index 0
    np.testing.assert_array_equal(np.asarray(params["0"]["w"]), w1)
    # lr coefs survived
    assert net.nodes[0].comp.attrs["bias_learn_rate_coef"] == 2.0
    x = jnp.asarray(rngs.randn(3, 4).astype(np.float32))
    y, _ = net.apply(params, x)
    want = 1 / (1 + np.exp(-(np.asarray(x) @ w1.T + b1)))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5)
