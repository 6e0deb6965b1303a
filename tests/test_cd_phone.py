"""CD-phone prep tests (reference: src/aslp-bin/aslp-acc-tree-stats-
cd-phone-{kmeans,equal,viterbi}.cc, aslp-acc-tree-stats-phone-*.cc,
aslp-compile-questions-phone.cc, aslp-tree-bind-info.cc,
aslp_scripts/cd_phone/prepare_cd_phone.sh pipeline)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.fst import Lang, Lexicon
from kaldi_aslp_tpu.gmm import MonophoneTrainer, MonoTrainOptions
from kaldi_aslp_tpu.tree.cd_phone import (
    NUM_SUBSTATES,
    acc_tree_stats_cd_phone,
    build_cd_phone_tree,
    compile_questions_phone,
    convert_ali_to_cd_phone,
    summarize_equal,
    summarize_kmeans,
    summarize_mean,
    summarize_median,
    tree_bind_info,
)


def _mono_system(rng):
    lex = Lexicon.from_text("AB a b\nBA b a\nAA a a\n")
    lang = Lang.build(lex)

    def center(ph):
        return {"a": np.array([3.0, 0.0]), "b": np.array([-3.0, 0.0]),
                "SIL": np.array([0.0, 3.0])}[ph]

    feats, texts = {}, {}
    words = ["AB", "BA", "AA"]
    pron = {w: p[0] for w, p in lex.prons.items()}
    for u in range(10):
        ws = [words[rng.randint(3)] for _ in range(3)]
        seq = ["SIL"]
        for w in ws:
            seq.extend(pron[w])
            seq.append("SIL")
        frames = [center(ph) + 0.3 * rng.randn(rng.randint(6, 10), 2)
                  for ph in seq]
        feats[f"u{u}"] = np.concatenate(frames).astype(np.float32)
        texts[f"u{u}"] = ws
    mono = MonophoneTrainer(lang, opts=MonoTrainOptions(
        num_iters=5, totgauss=30, realign_iters="1 2 3"))
    am, tm = mono.train(feats, texts)
    alis = mono.align(am, feats, texts)
    return lang, tm, feats, alis


def test_summarizers_shapes(rng):
    frames = rng.randn(20, 4)
    assert summarize_equal(frames).shape == (4 * NUM_SUBSTATES,)
    assert summarize_kmeans(frames).shape == (4 * NUM_SUBSTATES,)
    assert summarize_mean(frames).shape == (4,)
    assert summarize_median(frames).shape == (4,)
    # degenerate short segment
    assert summarize_kmeans(frames[:2]).shape == (4 * NUM_SUBSTATES,)


def test_kmeans_summary_orders_clusters_in_time(rng):
    """Sequential init means cluster k starts at the k-th third; for a
    cleanly 3-phase segment the concatenated means recover the phase
    means."""
    a = np.full((6, 2), 0.0) + 0.01 * rng.randn(6, 2)
    b = np.full((6, 2), 5.0) + 0.01 * rng.randn(6, 2)
    c = np.full((6, 2), -5.0) + 0.01 * rng.randn(6, 2)
    vec = summarize_kmeans(np.concatenate([a, b, c]))
    np.testing.assert_allclose(vec[:2], a.mean(0), atol=0.1)
    np.testing.assert_allclose(vec[2:4], b.mean(0), atol=0.1)
    np.testing.assert_allclose(vec[4:6], c.mean(0), atol=0.1)


@pytest.mark.parametrize("method", ["kmeans", "equal", "viterbi",
                                    "mean", "mean-per-frame", "median"])
def test_acc_stats_methods(rng, method):
    lang, tm, feats, alis = _mono_system(rng)
    stats = {}
    for u in feats:
        stats = acc_tree_stats_cd_phone(
            feats[u], alis[u], tm, method=method, stats=stats)
    assert stats
    for (window, pc), s in stats.items():
        assert len(window) == 3 and pc == 0
        assert window[1] != 0
        expected_dim = 2 * NUM_SUBSTATES if method in (
            "kmeans", "equal", "viterbi") else 2
        assert s.sum.shape == (expected_dim,)


def test_cd_phone_pipeline_ties_and_converts(rng):
    """Full prepare_cd_phone chain: stats → questions → tree →
    alignment conversion (segment + frame level)."""
    lang, tm, feats, alis = _mono_system(rng)
    stats = {}
    for u in feats:
        stats = acc_tree_stats_cd_phone(
            feats[u], alis[u], tm, method="kmeans", stats=stats)
    phones = sorted({w[1] for (w, _) in stats})
    questions = compile_questions_phone(stats, phones)
    assert questions
    tree = build_cd_phone_tree(stats, phones, num_leaves=6,
                               questions=questions, min_gain=1.0)
    assert 1 <= tree.num_pdfs <= 6
    # ties: number of distinct windows >= number of cd phones
    assert len(stats) >= tree.num_pdfs

    bind = tree_bind_info(tree, stats)
    lines = bind.strip().splitlines()
    assert len(lines) == len(stats)
    assert all(len(line.split()) == 4 for line in lines)

    for u in list(feats)[:3]:
        seg_labels = convert_ali_to_cd_phone(tm, tree, alis[u])
        frame_labels = convert_ali_to_cd_phone(tm, tree, alis[u],
                                               per_frame=True)
        assert len(frame_labels) == len(alis[u])
        assert set(seg_labels) <= set(range(tree.num_pdfs))
        # frame labels collapse to segment labels
        collapsed = [frame_labels[0]]
        for x in frame_labels[1:]:
            if x != collapsed[-1]:
                collapsed.append(x)
        # collapsing may merge adjacent equal cd-phones from distinct
        # segments, so collapsed is a subsequence-compatible length
        assert len(collapsed) <= len(seg_labels)
