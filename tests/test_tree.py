"""Decision-tree / triphone-chain tests (reference:
src/tree/build-tree-test.cc pattern; steps/train_deltas.sh stage order)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.tree.cluster import (
    GaussStats,
    cluster_bottom_up,
    kmeans_cluster,
)
from kaldi_aslp_tpu.tree.build_tree import (
    build_tree,
    cluster_phones_into_questions,
    stats_from_alignment,
)
from kaldi_aslp_tpu.fst.context import ContextWindows, compose_context
from kaldi_aslp_tpu.fst import Fst, Lang, Lexicon, make_linear_acceptor, \
    make_lexicon_fst, make_unigram_grammar
from kaldi_aslp_tpu.hmm import HmmTopology, TransitionModel
from kaldi_aslp_tpu.gmm.deltas import (
    DeltasTrainer,
    DeltasTrainOptions,
    make_cd_decode_graph,
)
from kaldi_aslp_tpu.gmm import MonophoneTrainer, MonoTrainOptions, \
    gmm_loglikes
from kaldi_aslp_tpu.decoder import PackedGraph, ViterbiDecoder
from kaldi_aslp_tpu.ops.edit_distance import score_utterances


def test_gauss_stats_objf():
    rng = np.random.RandomState(0)
    tight = GaussStats.from_frames(0.1 * rng.randn(100, 2))
    wide = GaussStats.from_frames(5.0 * rng.randn(100, 2))
    # tighter cluster → higher per-frame objf
    assert tight.objf() / 100 > wide.objf() / 100


def test_cluster_bottom_up():
    rng = np.random.RandomState(1)
    stats = (
        [GaussStats.from_frames(rng.randn(50, 2) + [0, 0])
         for _ in range(3)]
        + [GaussStats.from_frames(rng.randn(50, 2) + [10, 10])
           for _ in range(3)]
    )
    assign = cluster_bottom_up(stats, 2)
    assert assign[0] == assign[1] == assign[2]
    assert assign[3] == assign[4] == assign[5]
    assert assign[0] != assign[3]


def test_kmeans():
    rng = np.random.RandomState(2)
    v = np.concatenate([rng.randn(30, 2), rng.randn(30, 2) + 8])
    a = kmeans_cluster(v, 2)
    assert len(set(a[:30])) == 1 and len(set(a[30:])) == 1
    assert a[0] != a[-1]


def test_stats_from_alignment_contexts():
    feats = np.arange(12, dtype=np.float64).reshape(6, 2)
    phones = np.array([1, 1, 2, 2, 2, 3])
    pcs = np.zeros(6, np.int64)
    stats = stats_from_alignment(feats, phones, pcs)
    # windows: (0,1,2) for phone 1; (1,2,3) for 2; (2,3,0) for 3
    assert ((0, 1, 2), 0) in stats
    assert ((1, 2, 3), 0) in stats
    assert ((2, 3, 0), 0) in stats
    assert stats[((1, 2, 3), 0)].count == 3


def test_build_tree_splits_on_context(rng):
    """Phone 2's acoustics depend on its left neighbor → the tree must
    split on position 0."""
    stats = {}
    for left, shift in ((1, 0.0), (3, 8.0)):
        frames = rng.randn(200, 2) + shift
        s = GaussStats.from_frames(frames)
        stats[((left, 2, 0), 0)] = s
    tree = build_tree(
        stats, phones=[1, 2, 3], pdf_classes_per_phone={1: 1, 2: 1, 3: 1},
        questions=[[1], [3], [1, 3]], max_leaves=10, min_gain=5.0,
        min_count=5.0,
    )
    p_a = tree.compute((1, 2, 0), 0)
    p_b = tree.compute((3, 2, 0), 0)
    assert p_a != p_b  # context-split happened
    # unseen context falls to some existing leaf without error
    assert tree.compute((99, 2, 0), 0) in (p_a, p_b)


def test_compose_context_triphone():
    # linear phone acceptor 1 2 3 → windows (0,1,2)(1,2,3)(2,3,0)
    lg = Fst.linear([(1, 10), (2, 0), (3, 0)])
    clg, table = compose_context(lg)
    # collect windows along the single path
    wins = []
    s = clg.start
    visited = set()
    while s not in clg.finals:
        assert s not in visited
        visited.add(s)
        arcs = clg.arcs[s]
        assert len(arcs) == 1
        a = arcs[0]
        if a.ilabel != 0:
            wins.append(table.window(a.ilabel))
        s = a.nextstate
    assert wins == [(0, 1, 2), (1, 2, 3), (2, 3, 0)]


def _toy_lang():
    lex = Lexicon.from_text("YES Y\nNO N\n")
    return Lang.build(lex)


def _ctx_corpus(rng, lang, num_utts=14, words_per_utt=4):
    """Synthetic data where Y's acoustics depend on the previous word's
    last phone (coarticulation): tests that the triphone system works
    end-to-end."""
    def center(ph, left):
        base = {"Y": np.array([3.0, 0.0]), "N": np.array([-3.0, 0.0]),
                "SIL": np.array([0.0, 3.0])}[ph]
        if ph == "Y" and left == "N":
            base = base + np.array([0.0, -2.5])  # context shift
        return base

    feats, texts = {}, {}
    for u in range(num_utts):
        words = [("YES" if rng.rand() < 0.5 else "NO")
                 for _ in range(words_per_utt)]
        seq = ["SIL"]
        for w in words:
            seq.append("Y" if w == "YES" else "N")
            seq.append("SIL")
        frames = []
        for i, ph in enumerate(seq):
            left = seq[i - 1] if i else "SIL"
            n = rng.randint(8, 14)
            frames.append(center(ph, left) + 0.4 * rng.randn(n, 2))
        feats[f"u{u}"] = np.concatenate(frames).astype(np.float32)
        texts[f"u{u}"] = words
    return feats, texts


def test_triphone_end_to_end(rng):
    lang = _toy_lang()
    feats, texts = _ctx_corpus(rng, lang)
    mono = MonophoneTrainer(
        lang, opts=MonoTrainOptions(num_iters=6, totgauss=40,
                                    realign_iters="1 2 3 4 5"),
    )
    am0, tm0 = mono.train(feats, texts)
    alis = mono.align(am0, feats, texts)

    trainer = DeltasTrainer(
        lang, mono.topo,
        DeltasTrainOptions(num_iters=8, totgauss=120, num_leaves=40,
                           realign_iters="2 4 6", tree_min_gain=5.0),
    )
    am, tm = trainer.train(feats, texts, tm0, alis)
    assert trainer.tree.num_pdfs >= tm0.num_pdfs  # tree grew
    G = make_unigram_grammar({"YES": 0.5, "NO": 0.5}, lang.words)
    hclg, tm_dec = make_cd_decode_graph(lang, G, trainer)
    lut = tm_dec.alignment_to_pdfs(
        np.arange(tm_dec.num_transition_ids + 1)
    )
    dec = ViterbiDecoder(PackedGraph.from_fst(hclg), lut,
                         acoustic_scale=1.0, word_ins_penalty=2.0)
    packed = am.pack()
    import jax.numpy as jnp
    hyps = {}
    for u, f in feats.items():
        ll = np.asarray(gmm_loglikes(jnp.asarray(f), *packed))
        words, _, _ = dec.decode(ll)
        hyps[u] = [lang.words.sym(w) for w in words]
    stats = score_utterances(texts, hyps)
    assert stats.wer == 0.0, stats.report()
