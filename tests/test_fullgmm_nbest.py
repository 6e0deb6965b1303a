"""Full-covariance GMM + n-best/LM-rescoring tests (reference:
full-gmm.cc, mle-full-gmm.cc, lattice-to-nbest, lattice-lmrescore)."""

import numpy as np
import pytest
import jax.numpy as jnp

from kaldi_aslp_tpu.gmm import AmDiagGmm, gmm_loglikes
from kaldi_aslp_tpu.gmm.full_gmm import (
    AmFullGmm,
    full_gmm_accumulate,
    full_gmm_loglikes,
    full_gmm_mle_update,
)
from kaldi_aslp_tpu.fst import Lang, Lexicon, make_unigram_grammar
from kaldi_aslp_tpu.fst.ctc_graph import ctc_lut, make_ctc_decode_graph
from kaldi_aslp_tpu.decoder import PackedGraph, generate_lattice
from kaldi_aslp_tpu.decoder.nbest import (
    lattice_nbest,
    lm_score_words,
    rescore_nbest,
)


def test_full_gmm_matches_diag_when_diagonal(rng):
    am = AmDiagGmm(
        weights=np.array([[0.6, 0.4], [1.0, 0.0]], np.float32),
        means=rng.randn(2, 2, 3).astype(np.float32),
        vars=(0.5 + rng.rand(2, 2, 3)).astype(np.float32),
    )
    full = AmFullGmm.from_diag(am)
    feats = rng.randn(20, 3).astype(np.float32)
    ll_diag = np.asarray(gmm_loglikes(jnp.asarray(feats), *am.pack()))
    ll_full = np.asarray(full_gmm_loglikes(jnp.asarray(feats),
                                           *full.pack()))
    np.testing.assert_allclose(ll_full, ll_diag, rtol=1e-3, atol=1e-3)


def test_full_gmm_learns_correlation(rng):
    """Correlated data: a full-cov model must beat the diagonal fit."""
    n = 2000
    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    L = np.linalg.cholesky(cov)
    feats = (rng.randn(n, 2) @ L.T).astype(np.float32)
    pdfs = np.zeros(n, np.int32)
    diag = AmDiagGmm(np.ones((1, 1), np.float32),
                     np.zeros((1, 1, 2), np.float32),
                     np.ones((1, 1, 2), np.float32))
    full = AmFullGmm.from_diag(diag)
    for _ in range(3):
        occ, macc, sacc = full_gmm_accumulate(full, feats, pdfs)
        full = full_gmm_mle_update(full, occ, macc, sacc)
    # off-diagonal covariance recovered
    assert abs(full.covars[0, 0, 0, 1] - 0.9) < 0.05
    ll_full = np.asarray(full_gmm_loglikes(jnp.asarray(feats),
                                           *full.pack())).mean()
    ll_diag = np.asarray(gmm_loglikes(jnp.asarray(feats),
                                      *diag.pack())).mean()
    assert ll_full > ll_diag + 0.3


def _lattice_setup(rng):
    lex = Lexicon.from_text("YES Y\nNO N\n<SIL> SIL\n")
    lang = Lang.build(lex)
    G = make_unigram_grammar({"YES": 0.5, "NO": 0.5}, lang.words)
    packed = PackedGraph.from_fst(make_ctc_decode_graph(lang, G))
    lut = ctc_lut(len(lang.phones))
    y, n = lang.phones.id("Y"), lang.phones.id("N")
    V = len(lang.phones)
    # ambiguous second word
    ll = np.full((6, V), np.log(0.02), np.float32)
    ll[0, 0] = ll[3, 0] = ll[5, 0] = np.log(0.9)
    ll[1, y] = ll[2, y] = np.log(0.9)
    ll[4, n] = np.log(0.45)
    ll[4, y] = np.log(0.35)
    lat = generate_lattice(packed, ll, lut, 1.0, beam=15.0)
    return lang, G, lat


def test_lattice_nbest(rng):
    lang, G, lat = _lattice_setup(rng)
    nbest = lattice_nbest(lat, n=5)
    assert len(nbest) >= 2
    texts = [" ".join(lang.words.sym(w) for w in e.words)
             for e in nbest]
    assert texts[0] == "YES NO"          # acoustics favor NO
    assert "YES YES" in texts            # alternative present
    # sorted by cost, distinct
    costs = [e.total_cost for e in nbest]
    assert costs == sorted(costs)
    assert len(set(e.words for e in nbest)) == len(nbest)


def test_lm_rescoring_flips_hypothesis(rng):
    lang, G_old, lat = _lattice_setup(rng)
    nbest = lattice_nbest(lat, n=5)
    # a new LM that strongly prefers YES flips the second word
    G_new = make_unigram_grammar({"YES": 0.95, "NO": 0.05}, lang.words)
    rescored = rescore_nbest(nbest, G_old, G_new, acoustic_scale=0.1,
                             lm_scale=1.0)
    best = " ".join(lang.words.sym(w) for w in rescored[0].words)
    assert best == "YES YES", best
    # LM scorer sanity
    cost_yes = lm_score_words(G_new, [lang.words.id("YES")])
    cost_no = lm_score_words(G_new, [lang.words.id("NO")])
    assert cost_yes < cost_no
