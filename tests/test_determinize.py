"""Determinization / minimization tests (reference:
fstext/determinize-star-test.cc property-testing style: random machines,
equivalence checks + determinism property)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.fst import (
    Arc,
    EPS,
    Fst,
    Lang,
    Lexicon,
    make_lexicon_fst,
    make_unigram_grammar,
)
from kaldi_aslp_tpu.fst.determinize import determinize, minimize_encoded
from tests.test_fst import _accepts


def _is_deterministic(fst):
    for s in range(fst.num_states):
        seen = set()
        for a in fst.arcs[s]:
            if a.ilabel == EPS:
                continue  # output chains allowed
            if a.ilabel in seen:
                return False
            seen.add(a.ilabel)
    return True


def test_determinize_simple_union():
    # two paths both starting with input 1 → nondeterministic
    A = Fst.linear([(1, 10), (2, 20)], weights=[0.5, 0.0])
    B = Fst.linear([(1, 10), (3, 30)], weights=[0.2, 0.0])
    U = A.union(B)
    D = determinize(U)
    assert _is_deterministic(D)
    for seq, want_w, want_o in (([1, 2], 0.5, (10, 20)),
                                ([1, 3], 0.2, (10, 30))):
        w, o = _accepts(D, seq)
        assert w == pytest.approx(want_w, abs=1e-3)
        assert o == want_o
    w, _ = _accepts(D, [2])
    assert w == float("inf")


def test_determinize_output_residuals():
    """Diverging outputs on a shared input prefix must be delayed."""
    A = Fst.linear([(1, 10), (2, 11)])
    B = Fst.linear([(1, 20), (3, 21)])
    D = determinize(A.union(B))
    assert _is_deterministic(D)
    w, o = _accepts(D, [1, 2])
    assert o == (10, 11) and w < float("inf")
    w, o = _accepts(D, [1, 3])
    assert o == (20, 21) and w < float("inf")


def test_determinize_lexicon_grammar():
    """det(L∘G) equivalent to L∘G on sampled strings and smaller or
    equal in states (the mkgraph role)."""
    lex = Lexicon.from_text(
        "YES Y EH S\nYELL Y EH L\nNO N OW\n<SIL> SIL\n"
    )
    lang = Lang.build(lex)
    G = make_unigram_grammar(
        {"YES": 0.4, "YELL": 0.3, "NO": 0.3}, lang.words
    )
    L = make_lexicon_fst(lang, sil_prob=0.3).arc_sort("olabel")
    LG = L.compose(G).remove_epsilon()
    D = determinize(LG)
    assert _is_deterministic(D)
    ph = lang.phones
    tests = [
        [ph.id("Y"), ph.id("EH"), ph.id("S")],
        [ph.id("Y"), ph.id("EH"), ph.id("L")],
        [ph.id("N"), ph.id("OW")],
        [ph.id("Y"), ph.id("EH"), ph.id("S"), ph.id("SIL"),
         ph.id("N"), ph.id("OW")],
    ]
    for seq in tests:
        w1, o1 = _accepts(LG, seq)
        w2, o2 = _accepts(D, seq)
        assert w1 == pytest.approx(w2, abs=1e-3), seq
        assert o1 == o2, seq
    # garbage rejected by both
    w1, _ = _accepts(LG, [ph.id("S"), ph.id("S")])
    w2, _ = _accepts(D, [ph.id("S"), ph.id("S")])
    assert w1 == w2 == float("inf")


def test_minimize_encoded_merges_equivalent():
    # two identical suffix branches → minimization merges them
    f = Fst()
    s = [f.add_state() for _ in range(5)]
    f.set_start(s[0])
    f.add_arc(s[0], Arc(1, 1, 0.0, s[1]))
    f.add_arc(s[0], Arc(2, 2, 0.0, s[2]))
    f.add_arc(s[1], Arc(3, 3, 0.5, s[3]))
    f.add_arc(s[2], Arc(3, 3, 0.5, s[4]))
    f.set_final(s[3])
    f.set_final(s[4])
    m = minimize_encoded(f)
    assert m.num_states < f.num_states
    for seq in ([1, 3], [2, 3]):
        w0, o0 = _accepts(f, seq)
        w1, o1 = _accepts(m, seq)
        assert w0 == pytest.approx(w1) and o0 == o1


def test_det_min_pipeline_shrinks():
    lex = Lexicon.from_text(
        "YES Y EH S\nYELL Y EH L\nNO N OW\nNOSE N OW S\n<SIL> SIL\n"
    )
    lang = Lang.build(lex)
    G = make_unigram_grammar(
        {w: 0.25 for w in ("YES", "YELL", "NO", "NOSE")}, lang.words
    )
    L = make_lexicon_fst(lang, sil_prob=0.3).arc_sort("olabel")
    LG = L.compose(G).remove_epsilon()
    D = minimize_encoded(determinize(LG))
    assert D.num_states <= LG.num_states
    ph = lang.phones
    seq = [ph.id("N"), ph.id("OW"), ph.id("S")]
    w1, o1 = _accepts(LG, seq)
    w2, o2 = _accepts(D, seq)
    assert w1 == pytest.approx(w2, abs=1e-3) and o1 == o2
