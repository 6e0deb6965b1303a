"""Batched decoder + Pallas inference path tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kaldi_aslp_tpu.fst import Lang, Lexicon, make_unigram_grammar
from kaldi_aslp_tpu.fst.ctc_graph import ctc_lut, make_ctc_decode_graph
from kaldi_aslp_tpu.decoder import PackedGraph, ViterbiDecoder
from kaldi_aslp_tpu.decoder.batched import BatchedViterbiDecoder
from kaldi_aslp_tpu.models import Nnet


def _setup():
    lex = Lexicon.from_text("YES Y\nNO N\n<SIL> SIL\n")
    lang = Lang.build(lex)
    G = make_unigram_grammar({"YES": 0.5, "NO": 0.5}, lang.words)
    tlg = make_ctc_decode_graph(lang, G)
    return lang, PackedGraph.from_fst(tlg), ctc_lut(len(lang.phones))


def test_batched_matches_single(rng):
    lang, packed, lut = _setup()
    y, n = lang.phones.id("Y"), lang.phones.id("N")
    V = len(lang.phones)
    utts = []
    for i in range(5):
        seq = [0] + [y if rng.rand() < 0.5 else n] * (2 + i) + [0, 0]
        ll = np.full((len(seq), V), np.log(0.02), np.float32)
        for t, s in enumerate(seq):
            ll[t, s] = np.log(0.9)
        utts.append(ll)
    single = ViterbiDecoder(packed, lut, acoustic_scale=1.0)
    batched = BatchedViterbiDecoder(packed, lut, acoustic_scale=1.0)
    got = batched.decode_batch(utts, bucket=16)
    for ll, (words_b, ali_b, score_b) in zip(utts, got):
        words_s, ali_s, score_s = single.decode(ll)
        assert words_b == words_s
        np.testing.assert_array_equal(ali_b, ali_s)
        assert score_b == pytest.approx(score_s, rel=1e-5)


def test_pallas_inference_flag(rng):
    """<Pallas> attr routes eval-mode apply through the kernel; train
    mode keeps the differentiable scan."""
    net = Nnet.from_proto(
        "<LstmProjectedStreams> <InputDim> 8 <OutputDim> 16 "
        "<CellDim> 24 <Pallas> true\n"
        "<AffineTransform> <InputDim> 16 <OutputDim> 4 <ParamStddev> 0.1"
    )
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(2, 9, 8).astype(np.float32))
    y_eval, _ = net.apply(params, x, train=False)
    y_train, _ = net.apply(params, x, train=True)
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(y_train),
                               rtol=1e-5, atol=1e-6)
    # gradient path still works (train mode)
    def loss(p):
        y, _ = net.apply(p, x, train=True)
        return jnp.sum(y ** 2)
    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(g))
