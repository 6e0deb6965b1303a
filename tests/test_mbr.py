"""MBR / confusion network tests (reference: src/lat/sausages.h)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.fst import Lang, Lexicon, make_unigram_grammar
from kaldi_aslp_tpu.fst.ctc_graph import ctc_lut, make_ctc_decode_graph
from kaldi_aslp_tpu.decoder import PackedGraph, ViterbiDecoder
from kaldi_aslp_tpu.decoder.lattice import generate_lattice
from kaldi_aslp_tpu.decoder.mbr import (
    lattice_arc_posteriors,
    minimum_bayes_risk,
)


def _setup():
    lex = Lexicon.from_text("YES Y\nNO N\n<SIL> SIL\n")
    lang = Lang.build(lex)
    G = make_unigram_grammar({"YES": 0.5, "NO": 0.5}, lang.words)
    tlg = make_ctc_decode_graph(lang, G)
    return lang, PackedGraph.from_fst(tlg), ctc_lut(len(lang.phones))


def test_arc_posteriors_sum_per_frame():
    lang, packed, lut = _setup()
    y = lang.phones.id("Y")
    seq = [0, y, y, 0]
    V = len(lang.phones)
    ll = np.full((len(seq), V), np.log(0.05), np.float32)
    for t, s in enumerate(seq):
        ll[t, s] = np.log(0.85)
    lat = generate_lattice(packed, ll, lut, 1.0, beam=10.0)
    post = lattice_arc_posteriors(lat)
    assert all(0.0 <= p <= 1.0 + 1e-6 for p in post)
    # per-frame posteriors over arcs sum to ~1 (every path crosses each t)
    for t in range(1, lat.num_frames + 1):
        s = sum(p for a, p in zip(lat.arcs, post) if a.t == t)
        assert s == pytest.approx(1.0, abs=1e-3), (t, s)


def test_mbr_decode_and_confidence():
    lang, packed, lut = _setup()
    y, n = lang.phones.id("Y"), lang.phones.id("N")
    V = len(lang.phones)
    # clear YES then ambiguous-but-leaning-NO
    seq_len = 8
    ll = np.full((seq_len, V), np.log(0.02), np.float32)
    ll[0, 0] = ll[3, 0] = ll[7, 0] = np.log(0.9)
    ll[1, y] = ll[2, y] = np.log(0.9)       # confident YES
    ll[4, n] = ll[5, n] = np.log(0.40)      # weak NO...
    ll[4, y] = ll[5, y] = np.log(0.30)      # ...vs weaker YES
    ll[6, 0] = np.log(0.9)
    lat = generate_lattice(packed, ll, lut, 1.0, beam=12.0)
    words, confs, slots = minimum_bayes_risk(lat)
    syms = [lang.words.sym(w) for w in words]
    assert syms == ["YES", "NO"], syms
    assert confs[0] > confs[1]  # clear word more confident
    assert 0.0 < confs[1] <= 1.0
