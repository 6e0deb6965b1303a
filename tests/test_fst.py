"""FST layer tests (reference behaviors: OpenFst compose/connect via
src/fstext/, make_lexicon_fst.pl, arpa2fst)."""

import math

import numpy as np
import pytest

from kaldi_aslp_tpu.fst import (
    Arc,
    EPS,
    Fst,
    Lang,
    Lexicon,
    SymbolTable,
    arpa_to_fst,
    make_lexicon_fst,
    make_linear_acceptor,
    make_unigram_grammar,
    parse_arpa,
)


def _accepts(fst, iseq):
    """Exhaustive tropical shortest-path check over input sequence."""
    # simple DP over (state, position) incl. eps moves
    from collections import deque
    INF = float("inf")
    best = {}
    dq = deque([(fst.start, 0, 0.0, ())])
    res = INF
    res_out = None
    while dq:
        s, i, w, out = dq.popleft()
        key = (s, i)
        if best.get(key, INF) <= w - 1e-12:
            continue
        best[key] = w
        if i == len(iseq) and s in fst.finals:
            total = w + fst.finals[s]
            if total < res:
                res, res_out = total, out
        for a in fst.arcs[s]:
            nout = out + ((a.olabel,) if a.olabel != EPS else ())
            if a.ilabel == EPS:
                dq.append((a.nextstate, i, w + a.weight, nout))
            elif i < len(iseq) and a.ilabel == iseq[i]:
                dq.append((a.nextstate, i + 1, w + a.weight, nout))
    return res, res_out


def test_linear_and_compose():
    # A: transduce 1->10, 2->20 ; B: 10->100, 20->200
    A = Fst.linear([(1, 10), (2, 20)])
    B = Fst.linear([(10, 100), (20, 200)])
    C = A.compose(B)
    w, out = _accepts(C, [1, 2])
    assert w == 0.0 and out == (100, 200)
    w, _ = _accepts(C, [2, 1])
    assert w == float("inf")


def test_compose_with_eps():
    # left machine emits eps output mid-path
    A = Fst()
    s0, s1, s2 = A.add_state(), A.add_state(), A.add_state()
    A.set_start(s0)
    A.add_arc(s0, Arc(1, 5, 0.5, s1))
    A.add_arc(s1, Arc(2, EPS, 0.25, s2))
    A.set_final(s2)
    B = Fst.linear([(5, 50)])
    C = A.compose(B)
    w, out = _accepts(C, [1, 2])
    assert w == pytest.approx(0.75)
    assert out == (50,)


def test_union_closure_concat():
    A = Fst.linear([(1, 1)])
    B = Fst.linear([(2, 2)])
    U = A.union(B).closure()
    for seq in ([1], [2], [1, 2, 1], []):
        w, _ = _accepts(U, seq)
        assert w < float("inf"), seq


def test_connect_trims_dead_states():
    f = Fst()
    s0, s1, s2 = f.add_state(), f.add_state(), f.add_state()
    f.set_start(s0)
    f.add_arc(s0, Arc(1, 1, 0.0, s1))
    f.add_arc(s0, Arc(2, 2, 0.0, s2))  # s2 is a dead end
    f.set_final(s1)
    g = f.connect()
    assert g.num_states == 2
    assert g.num_arcs == 1


def test_text_roundtrip():
    f = Fst.linear([(1, 2), (3, 4)], weights=[0.5, 1.5])
    text = f.to_text()
    g = Fst.from_text(text)
    w, out = _accepts(g, [1, 3])
    assert w == pytest.approx(2.0) and out == (2, 4)


def test_lexicon_fst():
    lex = Lexicon.from_text("YES Y\nNO N\n<SIL> SIL\n")
    lang = Lang.build(lex)
    L = make_lexicon_fst(lang, sil_prob=0.5)
    y, n = lang.phones.id("Y"), lang.phones.id("N")
    sil = lang.phones.id("SIL")
    wy, wn = lang.words.id("YES"), lang.words.id("NO")
    cost, out = _accepts(L, [y, n])
    assert out == (wy, wn)
    # silence between words allowed
    cost_sil, out_sil = _accepts(L, [y, sil, n])
    assert out_sil == (wy, wn)
    # the no-sil path costs -log(0.5) per junction; 3 junctions traversed
    assert cost == pytest.approx(3 * -math.log(0.5), rel=1e-5)


def test_unigram_grammar_compose_lexicon():
    lex = Lexicon.from_text("YES Y\nNO N\n<SIL> SIL\n")
    lang = Lang.build(lex)
    L = make_lexicon_fst(lang).arc_sort("olabel")
    G = make_unigram_grammar({"YES": 0.5, "NO": 0.5}, lang.words)
    LG = L.compose(G)
    y, n = lang.phones.id("Y"), lang.phones.id("N")
    w, out = _accepts(LG, [y, y, n])
    assert out == (lang.words.id("YES"), lang.words.id("YES"),
                   lang.words.id("NO"))
    assert w < float("inf")


ARPA = """
\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-0.30103 </s>
-99 <s> -0.30103
-0.60206 YES -0.30103
-0.60206 NO -0.30103

\\2-grams:
-0.30103 <s> YES
-0.30103 YES NO

\\end\\
"""


def test_parse_arpa():
    grams = parse_arpa(ARPA)
    assert len(grams[1]) == 4 and len(grams[2]) == 2
    assert grams[2][("<s>", "YES")][0] == pytest.approx(-0.30103)


def test_arpa_to_fst():
    words = SymbolTable()
    words.add("YES")
    words.add("NO")
    G = arpa_to_fst(ARPA, words)
    # "YES NO" uses bigrams: p(YES|<s>)·p(NO|YES)·p(</s>|NO backoff)
    w, _ = _accepts(G, [words.id("YES"), words.id("NO")])
    assert w < float("inf")
    # "NO" alone: unigram + end
    w2, _ = _accepts(G, [words.id("NO")])
    assert w2 < float("inf")
