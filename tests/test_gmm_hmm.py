"""GMM / HMM / alignment / decode tests, ending in the synthetic
"yesno" end-to-end slice (reference integration pattern:
egs/yesno/s5/run.sh — data → features → mono GMM → graph → decode → WER;
audio is synthesized since the corpus isn't downloadable in CI)."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from kaldi_aslp_tpu.hmm import HmmTopology, TransitionModel
from kaldi_aslp_tpu.gmm import (
    AmDiagGmm,
    MonophoneTrainer,
    MonoTrainOptions,
    gmm_loglikes,
    split_gaussians,
)
from kaldi_aslp_tpu.fst import (
    Lang,
    Lexicon,
    make_decode_graph,
    make_unigram_grammar,
)
from kaldi_aslp_tpu.decoder import PackedGraph, ViterbiDecoder, equal_align
from kaldi_aslp_tpu.ops.edit_distance import score_utterances


def test_topology_and_transition_model():
    topo = HmmTopology.default([1, 2, 3], sil_phones=[3])
    assert topo.entry(1).num_emitting == 3
    assert topo.entry(3).num_emitting == 4  # 5-state sil: 4 emitting

    pdf_map = {}
    nxt = 0
    for ph in topo.phones:
        for pc in range(topo.entry(ph).num_pdf_classes):
            pdf_map[(ph, pc)] = nxt
            nxt += 1
    tm = TransitionModel(topo, lambda p, c: pdf_map[(p, c)])
    assert tm.num_pdfs == nxt
    # tid round-trips
    for tid in range(1, tm.num_transition_ids + 1):
        ts, ai = tm.tid_to_arc(tid)
        assert tm.pair_to_tid(ts, ai) == tid
    # ali conversion
    ali = np.array([1, 1, 2, 3])
    pdfs = tm.alignment_to_pdfs(ali)
    assert pdfs.shape == (4,)


def test_gmm_loglikes_against_scipy_style(rng):
    P, M, D, T = 3, 2, 4, 10
    weights = np.abs(rng.rand(P, M)).astype(np.float32)
    weights /= weights.sum(1, keepdims=True)
    means = rng.randn(P, M, D).astype(np.float32)
    variances = (0.5 + np.abs(rng.rand(P, M, D))).astype(np.float32)
    feats = rng.randn(T, D).astype(np.float32)
    ll = np.asarray(gmm_loglikes(
        jnp.asarray(feats), jnp.asarray(weights), jnp.asarray(means),
        jnp.asarray(variances),
    ))
    # manual per-pdf computation
    for p in range(P):
        for t in range(3):
            comps = []
            for m in range(M):
                quad = ((feats[t] - means[p, m]) ** 2 /
                        variances[p, m]).sum()
                logn = (-0.5 * (D * math.log(2 * math.pi)
                                + np.log(variances[p, m]).sum() + quad))
                comps.append(math.log(weights[p, m]) + logn)
            want = np.logaddexp(*comps) if M == 2 else comps[0]
            assert ll[t, p] == pytest.approx(want, rel=1e-4)


def test_split_gaussians(rng):
    am = AmDiagGmm.flat_init(4, 3, np.zeros(3), np.ones(3))
    occ = np.abs(rng.rand(4, 1))
    am2 = split_gaussians(am, 8, occ)
    assert am2.num_gauss_per_pdf.sum() == 8
    # weights still normalized
    np.testing.assert_allclose(am2.weights.sum(1), 1.0, atol=1e-5)


def _toy_lang():
    lex = Lexicon.from_text("YES Y\nNO N\n")
    return Lang.build(lex)


def _synth_corpus(rng, lang, num_utts=20, words_per_utt=6):
    """Synthetic 'yesno': each phone is a distinct gaussian cloud in
    2-D feature space; silence separates words."""
    centers = {"Y": np.array([3.0, 0.0]), "N": np.array([-3.0, 0.0]),
               "SIL": np.array([0.0, 3.0])}
    feats, texts = {}, {}
    for u in range(num_utts):
        words = [("YES" if rng.rand() < 0.5 else "NO")
                 for _ in range(words_per_utt)]
        seq = ["SIL"]
        for w in words:
            seq.append("Y" if w == "YES" else "N")
            seq.append("SIL")
        frames = []
        for ph in seq:
            n = rng.randint(8, 16)
            frames.append(centers[ph] + 0.5 * rng.randn(n, 2))
        feats[f"u{u}"] = np.concatenate(frames).astype(np.float32)
        texts[f"u{u}"] = words
    return feats, texts


def test_equal_align_covers_frames(rng):
    lang = _toy_lang()
    trainer = MonophoneTrainer(lang)
    graph = trainer.compiler.compile(["YES", "NO"])
    ali = equal_align(graph, trainer.trans_model, 50)
    assert len(ali) == 50
    assert (ali > 0).all()
    phones = trainer.trans_model.alignment_to_phones(ali)
    names = [lang.phones.sym(p) for p in phones]
    assert "Y" in names and "N" in names


def test_mono_train_and_decode_end_to_end(rng):
    """The synthetic yesno slice: train mono GMM, build HCLG, decode,
    assert WER == 0 (separable synthetic data)."""
    lang = _toy_lang()
    feats, texts = _synth_corpus(rng, lang, num_utts=12, words_per_utt=4)
    opts = MonoTrainOptions(num_iters=8, totgauss=60,
                            realign_iters="1 2 3 4 5 6 7")
    trainer = MonophoneTrainer(lang, opts=opts)
    am, tm = trainer.train(feats, texts)
    assert am.num_pdfs == tm.num_pdfs

    G = make_unigram_grammar({"YES": 0.5, "NO": 0.5}, lang.words)
    hclg = make_decode_graph(lang, G, tm)
    packed = PackedGraph.from_fst(hclg)
    lut = tm.alignment_to_pdfs(np.arange(tm.num_transition_ids + 1))
    dec = ViterbiDecoder(packed, lut, acoustic_scale=1.0)

    am_packed = am.pack()
    hyps = {}
    for u, f in feats.items():
        ll = np.asarray(gmm_loglikes(jnp.asarray(f), *am_packed))
        words, ali, score = dec.decode(ll)
        hyps[u] = [lang.words.sym(w) for w in words]
        assert len(ali) == len(f)
    stats = score_utterances(texts, hyps)
    assert stats.wer == 0.0, stats.report() + f" hyps={hyps}"


def test_alignment_quality(rng):
    """Viterbi alignment recovers the phone segmentation on separable
    data (reference: gmm-align-compiled behavior)."""
    lang = _toy_lang()
    feats, texts = _synth_corpus(rng, lang, num_utts=10, words_per_utt=3)
    opts = MonoTrainOptions(num_iters=6, totgauss=40,
                            realign_iters="1 2 3 4 5")
    trainer = MonophoneTrainer(lang, opts=opts)
    am, tm = trainer.train(feats, texts)
    alis = trainer.align(am, feats, texts)
    u = "u0"
    phones = tm.alignment_to_phones(alis[u])
    names = [lang.phones.sym(p) for p in phones if
             lang.phones.sym(p) != "SIL"]
    want = ["Y" if w == "YES" else "N" for w in texts[u]]
    assert names == want


def test_align_batched_matches_per_utterance(rng):
    """align_batched (one device program per shape bucket, amortizing
    the per-utterance dispatch RTT) returns EXACTLY what the
    per-utterance ViterbiDecoder path returns — words, alignment and
    score — including across utterances that land in different shape
    buckets (ragged lengths + ragged graphs)."""
    from kaldi_aslp_tpu.decoder.viterbi import align_batched
    from kaldi_aslp_tpu.gmm.mono import gmm_loglikes_bucketed

    lang = _toy_lang()
    feats, texts = _synth_corpus(rng, lang, num_utts=9, words_per_utt=3)
    # ragged: drop frames from some utterances
    for i, u in enumerate(sorted(feats)):
        feats[u] = feats[u][: len(feats[u]) - 7 * i] \
            if len(feats[u]) > 7 * i + 20 else feats[u]
    opts = MonoTrainOptions(num_iters=4, totgauss=40,
                            realign_iters="1 2 3")
    trainer = MonophoneTrainer(lang, opts=opts)
    am, tm = trainer.train(feats, texts)
    packed = am.pack()
    graphs = {u: PackedGraph.from_fst(trainer.compiler.compile(texts[u]))
              for u in feats}
    lls = {u: np.asarray(gmm_loglikes_bucketed(feats[u], packed))
           for u in feats}
    lut = trainer._tid_pdf_lut

    res = align_batched(graphs, lut, lls, acoustic_scale=1.0, batch=4)
    for u in feats:
        dec = ViterbiDecoder(graphs[u], lut, acoustic_scale=1.0)
        words, ali, score = dec.decode(lls[u])
        bw, bali, bscore = res[u]
        assert bw == words, u
        assert np.array_equal(bali, ali), u
        assert abs(bscore - score) < 1e-3, u


def test_transition_prob_transfer_to_cd_model():
    """copy_log_probs_from carries trained MLE transition probs into a
    re-enumerated (CD) transition model for every shared triple, while
    new triples keep topology priors (the round-5 tri-inversion fix:
    make_cd_decode_graph's fresh model must not revert to priors)."""
    topo = HmmTopology.default([1, 2], sil_phones=[2])
    pdf_map = {}
    k = 0
    for p in (1, 2):
        for c in range(topo.entry(p).num_pdf_classes):
            pdf_map[(p, c)] = k
            k += 1
    tm = TransitionModel(topo, lambda p, c: pdf_map[(p, c)])
    # train: skewed self-loop counts move probs far from priors
    counts = np.zeros(tm.num_transition_ids + 1)
    for tid in range(1, tm.num_transition_ids + 1):
        counts[tid] = 90.0 if tm.is_self_loop(tid) else 10.0
    tm.mle_update(counts)

    # CD re-enumeration: same triples PLUS a context-split pdf for
    # phone 1 state 0 (a new leaf id)
    triples = [(s.phone, s.hmm_state, s.pdf) for s in tm.states[1:]]
    new_pdf = max(t[2] for t in triples) + 1
    triples.append((1, 0, new_pdf))
    tm_cd = TransitionModel(topo, triples=triples)
    before = tm_cd.log_probs.copy()
    tm_cd.copy_log_probs_from(tm)

    for s in tm.states[1:]:
        ts_old = tm.transition_state(s.phone, s.hmm_state, s.pdf)
        ts_new = tm_cd.transition_state(s.phone, s.hmm_state, s.pdf)
        n = len(tm._arcs[ts_old])
        np.testing.assert_allclose(
            tm_cd.log_probs[tm_cd._tid_start[ts_new]:
                            tm_cd._tid_start[ts_new] + n],
            tm.log_probs[tm._tid_start[ts_old]:
                         tm._tid_start[ts_old] + n])
    # trained probs really differ from priors (the transfer did work)
    assert not np.allclose(tm_cd.log_probs, before)
    # the new (unseen) triple keeps its topology prior
    ts_fresh = tm_cd.transition_state(1, 0, new_pdf)
    n = len(tm_cd._arcs[ts_fresh])
    np.testing.assert_allclose(
        tm_cd.log_probs[tm_cd._tid_start[ts_fresh]:
                        tm_cd._tid_start[ts_fresh] + n],
        before[tm_cd._tid_start[ts_fresh]:
               tm_cd._tid_start[ts_fresh] + n])
