"""Component zoo tests (reference test pattern:
src/aslp-nnet/nnet-component-test.cc — config string → propagate →
assert output; plus scan-vs-loop equivalence for recurrent cells)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kaldi_aslp_tpu.models import (
    AffineTransform,
    BLstmProjectedStreams,
    BLstmProjectedStreamsLC,
    BatchNormalization,
    CompactFsmn,
    ConvolutionalComponent,
    GruStreams,
    LengthNorm,
    Lstm,
    LstmProjectedStreams,
    MaxPoolingComponent,
    Pnorm,
    RowConvolution,
    Splice,
    build_component,
    known_tokens,
)


def key():
    return jax.random.PRNGKey(777)


def test_proto_parsing():
    c = build_component(
        "<AffineTransform> <InputDim> 40 <OutputDim> 512 "
        "<ParamStddev> 0.05 <BiasMean> 0.0 <BiasRange> 0.0"
    )
    assert isinstance(c, AffineTransform)
    assert c.input_dim == 40 and c.output_dim == 512
    assert c.attrs["param_stddev"] == 0.05
    p = c.init_params(key())
    assert p["w"].shape == (512, 40)
    np.testing.assert_allclose(np.asarray(p["b"]), 0.0)


def test_component_registry_covers_reference_zoo():
    need = [
        "<AffineTransform>", "<LinearTransform>", "<Sigmoid>", "<Tanh>",
        "<Softmax>", "<BlockSoftmax>", "<Dropout>", "<ReLU>", "<Pnorm>",
        "<Maxout>", "<Splice>", "<Copy>", "<LengthNormComponent>",
        "<AddShift>", "<Rescale>", "<ConvolutionalComponent>",
        "<MaxPoolingComponent>", "<BatchNormalization>",
        "<LstmProjectedStreams>", "<BLstmProjectedStreams>",
        "<BLstmProjectedStreamsLC>", "<Lstm>", "<BLstm>", "<GruStreams>",
        "<LstmCifgProjectedStreams>", "<CompactFsmn>", "<RowConvolution>",
        "<Transmit>",
    ]
    toks = known_tokens()
    missing = [t for t in need if t not in toks]
    assert not missing, f"missing components: {missing}"


def test_affine(rng):
    c = AffineTransform(4, 3)
    p = {"w": jnp.asarray(rng.randn(3, 4).astype(np.float32)),
         "b": jnp.asarray(rng.randn(3).astype(np.float32))}
    x = jnp.asarray(rng.randn(5, 4).astype(np.float32))
    y, _ = c.apply(p, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) @ np.asarray(p["w"]).T + np.asarray(p["b"]),
        rtol=1e-5, atol=1e-5,
    )


def test_length_norm(rng):
    c = LengthNorm(6, 6)
    x = jnp.asarray(rng.randn(4, 6).astype(np.float32)) * 10
    y, _ = c.apply({}, x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=1), 1.0, rtol=1e-5
    )


def test_pnorm(rng):
    c = Pnorm(8, 4, p=2.0)
    x = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    y, _ = c.apply({}, x)
    xn = np.asarray(x).reshape(3, 4, 2)
    np.testing.assert_allclose(
        np.asarray(y), np.sqrt((xn ** 2).sum(-1)), rtol=1e-5
    )


def test_splice_offsets(rng):
    c = build_component(
        '<Splice> <InputDim> 3 <OutputDim> 9 <BuildVector> "-1:1"'
    )
    x = jnp.asarray(rng.randn(1, 5, 3).astype(np.float32))
    y, _ = c.apply({}, x)
    assert y.shape == (1, 5, 9)
    np.testing.assert_array_equal(y[0, 2, :3], x[0, 1])
    np.testing.assert_array_equal(y[0, 2, 3:6], x[0, 2])
    np.testing.assert_array_equal(y[0, 2, 6:], x[0, 3])
    np.testing.assert_array_equal(y[0, 0, :3], x[0, 0])  # clamp


def _np_lstmp_step(p, x_t, c_prev, r_prev, clip=50.0):
    gifo = x_t @ np.asarray(p["w_gifo_x"]).T + \
        r_prev @ np.asarray(p["w_gifo_r"]).T + np.asarray(p["bias"])
    C = c_prev.shape[-1]
    g, i, f, o = (gifo[..., :C], gifo[..., C:2*C],
                  gifo[..., 2*C:3*C], gifo[..., 3*C:])
    sig = lambda v: 1 / (1 + np.exp(-v))
    i = sig(i + np.asarray(p["peephole_i_c"]) * c_prev)
    f = sig(f + np.asarray(p["peephole_f_c"]) * c_prev)
    c = np.clip(f * c_prev + i * np.tanh(g), -clip, clip)
    o = sig(o + np.asarray(p["peephole_o_c"]) * c)
    m = o * np.tanh(c)
    r = m @ np.asarray(p["w_r_m"]).T
    return c, r


def test_lstmp_scan_matches_step_loop(rng):
    S, T, D, C, P = 3, 7, 5, 8, 4
    cell = LstmProjectedStreams(D, P, cell_dim=C)
    p = cell.init_params(key())
    x = rng.randn(S, T, D).astype(np.float32)
    y, state = cell.apply(p, jnp.asarray(x))
    c = np.zeros((S, C), np.float32)
    r = np.zeros((S, P), np.float32)
    for t in range(T):
        c, r = _np_lstmp_step(p, x[:, t], c, r)
        np.testing.assert_allclose(np.asarray(y[:, t]), r, rtol=1e-4,
                                   atol=1e-5)
    np.testing.assert_allclose(np.asarray(state["r"]), r, rtol=1e-4,
                               atol=1e-5)


def test_lstm_state_carry_streaming(rng):
    """Chunked streaming == one-shot (the prev_nnet_state_ behavior,
    reference: nnet-lstm-projected-streams.h:296-332)."""
    S, T, D, P = 2, 12, 4, 6
    cell = LstmProjectedStreams(D, P, cell_dim=8)
    p = cell.init_params(key())
    x = jnp.asarray(rng.randn(S, T, D).astype(np.float32))
    y_full, _ = cell.apply(p, x)
    y1, s = cell.apply(p, x[:, :5])
    y2, _ = cell.apply(p, x[:, 5:], state=s)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], axis=1)), np.asarray(y_full),
        rtol=1e-4, atol=1e-5,
    )


def test_lstm_padding_mask_invariance(rng):
    """Padded stream result equals the unpadded single-stream result."""
    D, P = 4, 6
    cell = LstmProjectedStreams(D, P, cell_dim=8)
    p = cell.init_params(key())
    x_short = rng.randn(1, 5, D).astype(np.float32)
    x_padded = np.concatenate(
        [x_short, 99 * np.ones((1, 3, D), np.float32)], axis=1
    )
    mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0, 0]], jnp.float32)
    y_pad, s_pad = cell.apply(p, jnp.asarray(x_padded), mask=mask)
    y_ref, s_ref = cell.apply(p, jnp.asarray(x_short))
    np.testing.assert_allclose(
        np.asarray(y_pad[:, :5]), np.asarray(y_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(y_pad[:, 5:]), 0.0)
    # carried state must reflect frame 4, not the padding
    np.testing.assert_allclose(
        np.asarray(s_pad["r"]), np.asarray(s_ref["r"]), rtol=1e-4, atol=1e-5
    )


def test_blstm_padding_equivalence(rng):
    """BLSTM on a padded batch == per-sequence BLSTM (masked backward)."""
    D, O = 3, 8
    comp = BLstmProjectedStreams(D, O, cell_dim=6)
    p = comp.init_params(key())
    x1 = rng.randn(1, 6, D).astype(np.float32)
    x2 = rng.randn(1, 4, D).astype(np.float32)
    xb = np.zeros((2, 6, D), np.float32)
    xb[0] = x1[0]
    xb[1, :4] = x2[0]
    mask = jnp.asarray([[1] * 6, [1] * 4 + [0] * 2], jnp.float32)
    yb, _ = comp.apply(p, jnp.asarray(xb), mask=mask)
    y1, _ = comp.apply(p, jnp.asarray(x1))
    y2, _ = comp.apply(p, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(yb[0]), np.asarray(y1[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yb[1, :4]), np.asarray(y2[0]),
                               rtol=1e-4, atol=1e-5)


def test_lc_blstm_chunked_backward(rng):
    """Backward direction must NOT see beyond the chunk boundary."""
    D, O, chunk = 3, 8, 4
    comp = BLstmProjectedStreamsLC(D, O, cell_dim=6, chunk_size=chunk)
    p = comp.init_params(key())
    x = rng.randn(1, 8, D).astype(np.float32)
    y, _ = comp.apply(p, jnp.asarray(x))
    # changing frames 4..7 must not affect the backward half of frames 0..3
    x2 = x.copy()
    x2[0, 4:] += 5.0
    y2, _ = comp.apply(p, jnp.asarray(x2))
    half = O // 2
    np.testing.assert_allclose(
        np.asarray(y[0, :4, half:]), np.asarray(y2[0, :4, half:]),
        rtol=1e-5, atol=1e-6,
    )
    # but the forward half of frames 4..7 DOES depend on frames 0..3
    x3 = x.copy()
    x3[0, 0] += 5.0
    y3, _ = comp.apply(p, jnp.asarray(x3))
    assert np.abs(np.asarray(y3[0, 5, :half] - y[0, 5, :half])).max() > 1e-6


def test_gru_shapes_and_carry(rng):
    comp = GruStreams(5, 7)
    p = comp.init_params(key())
    x = jnp.asarray(rng.randn(2, 9, 5).astype(np.float32))
    y, s = comp.apply(p, x)
    assert y.shape == (2, 9, 7) and s["h"].shape == (2, 7)
    y1, s1 = comp.apply(p, x[:, :4])
    y2, _ = comp.apply(p, x[:, 4:], state=s1)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(y),
        rtol=1e-4, atol=1e-5,
    )


def test_cfsmn(rng):
    comp = CompactFsmn(4, 4, l_order=2, r_order=1)
    p = comp.init_params(key())
    x = rng.randn(1, 6, 4).astype(np.float32)
    y, _ = comp.apply(p, jnp.asarray(x))
    a, c = np.asarray(p["a"]), np.asarray(p["c"])
    t = 3
    want = (x[0, t] + a[0] * x[0, t] + a[1] * x[0, t - 1]
            + a[2] * x[0, t - 2] + c[0] * x[0, t + 1])
    np.testing.assert_allclose(np.asarray(y[0, t]), want, rtol=1e-4,
                               atol=1e-5)


def test_row_convolution(rng):
    comp = RowConvolution(3, 3, future_ctx=2)
    p = comp.init_params(key())
    x = rng.randn(1, 5, 3).astype(np.float32)
    y, _ = comp.apply(p, jnp.asarray(x))
    w = np.asarray(p["w"])
    want = w[0] * x[0, 1] + w[1] * x[0, 2] + w[2] * x[0, 3]
    np.testing.assert_allclose(np.asarray(y[0, 1]), want, rtol=1e-4,
                               atol=1e-5)
    # tail: out-of-range taps contribute zero
    want_last = w[0] * x[0, 4]
    np.testing.assert_allclose(np.asarray(y[0, 4]), want_last, rtol=1e-4,
                               atol=1e-5)


def test_conv_and_maxpool(rng):
    # 2 splices of 8 bins, patch 3 step 1 → 6 patches, 4 filters → out 24
    conv = ConvolutionalComponent(
        16, 24, patch_dim=3, patch_step=1, patch_stride=8
    )
    assert conv.num_patches == 6 and conv.num_filters == 4
    p = conv.init_params(key())
    x = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    y, _ = conv.apply(p, x)
    assert y.shape == (2, 24)
    # hand-check patch 0: bins 0:3 of both splices
    patch0 = np.concatenate([np.asarray(x)[0, 0:3], np.asarray(x)[0, 8:11]])
    want = patch0 @ np.asarray(p["filters"]).T + np.asarray(p["bias"])
    np.testing.assert_allclose(np.asarray(y)[0, :4], want, rtol=1e-4,
                               atol=1e-5)

    pool = MaxPoolingComponent(24, 12, pool_size=2, pool_step=2,
                               pool_stride=4)
    yp, _ = pool.apply({}, y)
    assert yp.shape == (2, 12)
    yg = np.asarray(y).reshape(2, 6, 4)
    np.testing.assert_allclose(
        np.asarray(yp).reshape(2, 3, 4), np.maximum(yg[:, ::2], yg[:, 1::2]),
        rtol=1e-5,
    )


def test_batchnorm_train_eval(rng):
    bn = BatchNormalization(5, 5)
    p = bn.init_params(key())
    x = jnp.asarray((rng.randn(100, 5) * 3 + 7).astype(np.float32))
    y, state = bn.apply(p, x, train=True)
    np.testing.assert_allclose(np.asarray(y).mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y).std(0), 1.0, atol=1e-2)
    # eval mode uses accumulated stats
    y2, _ = bn.apply(p, x, state=state, train=False)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-3)
