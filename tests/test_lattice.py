"""Lattice tests (reference: lattice-faster-decoder + lattice-best-path
behavior; score_basic.sh sweep)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.fst import Lang, Lexicon, make_unigram_grammar
from kaldi_aslp_tpu.fst.ctc_graph import ctc_lut, make_ctc_decode_graph
from kaldi_aslp_tpu.decoder import PackedGraph, ViterbiDecoder
from kaldi_aslp_tpu.decoder.lattice import (
    generate_lattice,
    lattice_best_path,
    score_lmwt_sweep,
)


def _setup():
    lex = Lexicon.from_text("YES Y\nNO N\n<SIL> SIL\n")
    lang = Lang.build(lex)
    G = make_unigram_grammar({"YES": 0.6, "NO": 0.4}, lang.words)
    tlg = make_ctc_decode_graph(lang, G)
    return lang, PackedGraph.from_fst(tlg), ctc_lut(len(lang.phones))


def _scores(lang, seq, conf=0.9):
    V = len(lang.phones)
    ll = np.full((len(seq), V), np.log((1 - conf) / (V - 1)), np.float32)
    for t, u in enumerate(seq):
        ll[t, u] = np.log(conf)
    return ll


def test_lattice_best_path_matches_viterbi():
    lang, packed, lut = _setup()
    y, n = lang.phones.id("Y"), lang.phones.id("N")
    seq = [0, y, y, 0, n, 0, y, 0]
    ll = _scores(lang, seq)
    dec = ViterbiDecoder(packed, lut, acoustic_scale=1.0)
    words_v, _, score_v = dec.decode(ll)

    lat = generate_lattice(packed, ll, lut, acoustic_scale=1.0,
                           beam=10.0)
    assert lat.num_arcs() > 0
    words_l, cost_l = lattice_best_path(lat, acoustic_scale=1.0,
                                        lm_scale=1.0)
    assert words_l == words_v
    assert -cost_l == pytest.approx(score_v, rel=1e-4)


def test_lattice_contains_alternatives():
    """With ambiguous acoustics the lattice must hold both words."""
    lang, packed, lut = _setup()
    y, n = lang.phones.id("Y"), lang.phones.id("N")
    V = len(lang.phones)
    T = 4
    ll = np.full((T, V), np.log(0.01), np.float32)
    ll[:, 0] = np.log(0.3)
    ll[1:3, y] = np.log(0.45)   # Y slightly better...
    ll[1:3, n] = np.log(0.40)   # ...but N close behind
    ll[0, 0] = ll[3, 0] = np.log(0.9)
    lat = generate_lattice(packed, ll, lut, 1.0, beam=8.0)
    words_in_lattice = {w for a in lat.arcs for w in a.words}
    assert lang.words.id("YES") in words_in_lattice
    assert lang.words.id("NO") in words_in_lattice
    # tight beam keeps only the winner
    lat2 = generate_lattice(packed, ll, lut, 1.0, beam=0.01)
    words2 = {w for a in lat2.arcs for w in a.words}
    assert lang.words.id("NO") not in words2


def test_lmwt_sweep_changes_result():
    """Acoustic/LM balance flips the decision across the sweep."""
    lang, packed, lut = _setup()
    y, n = lang.phones.id("Y"), lang.phones.id("N")
    V = len(lang.phones)
    # acoustics slightly prefer NO, LM strongly prefers YES (0.6 vs 0.4
    # is mild; craft a graph-cost-sensitive case via weak acoustics)
    T = 3
    ll = np.full((T, V), np.log(0.05), np.float32)
    ll[0, 0] = np.log(0.8)
    ll[1, n] = np.log(0.30)
    ll[1, y] = np.log(0.28)
    ll[2, 0] = np.log(0.8)
    lat = generate_lattice(packed, ll, lut, 1.0, beam=20.0)
    refs = {"u": [lang.words.id("YES")]}
    sweep = score_lmwt_sweep({"u": lat}, refs, lmwt_range=range(1, 30, 4))
    wers = [s.wer for s in sweep.values()]
    # at high LMWT the LM prior (YES) wins → WER 0 somewhere
    assert min(wers) == 0.0
    # at LMWT=1 acoustics (NO) win → WER > 0 somewhere
    assert max(wers) > 0.0
