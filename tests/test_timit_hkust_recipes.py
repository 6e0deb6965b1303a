"""TIMIT-shaped CD-phone hybrid and HKUST-shaped syllable-CTC recipe
tests (reference: aslp_scripts/cd_phone/prepare_cd_phone.sh:29-53,
aslp_scripts/syllable/prepare_syllable_ctc.sh, make_h3_graph.sh /
aslp-make-h3-transducer.cc GetHmmAsFst3).

Full-scale WER evidence lives in STATUS.md (the medium-scale runs);
these tests lock the chains' mechanics at micro scale: the CD-phone
prep produces a consistent (targets, graph, lut) triple, the
minimum-duration topo actually enforces >= min_frames frames per unit,
and the pinyin lexicon/syllable conversion roundtrips."""

import numpy as np
import pytest

from kaldi_aslp_tpu.fst.lang import arpa_to_fst
from kaldi_aslp_tpu.hmm.topology import HmmTopology
from kaldi_aslp_tpu.recipes.hard_corpus import (
    HardCorpusOptions,
    build_corpus,
)


def _tiny_corpus():
    opts = HardCorpusOptions(num_words=30, num_train_speakers=3,
                             num_test_speakers=1)
    return build_corpus(opts, num_train=14, num_test=4, lm_pool_mult=3)


def test_fake_min_duration_topology():
    """The h3 topo: min_frames emitting states sharing pdf-class 0,
    no self-loop before the last — a unit cannot be traversed in fewer
    than min_frames frames."""
    topo = HmmTopology.fake_min_duration([1, 2], min_frames=3)
    e = topo.entry(1)
    assert e.num_emitting == 3
    assert e.num_pdf_classes == 1
    assert all(s.pdf_class == 0 for s in e.states[:-1])
    # states 0..min-2 advance with prob 1 (no self loop)
    for i in range(2):
        assert e.states[i].transitions == [(i + 1, 1.0)]
    # last emitting state self-loops
    assert (2, 0.5) in e.states[2].transitions
    assert (3, 0.5) in e.states[2].transitions


def test_cd_phone_chain_micro():
    """mono → tri → CD-phone prep: targets/lut/graph are mutually
    consistent (every decode-graph pdf < num_pdfs, targets in range,
    per-frame target length == alignment length)."""
    from kaldi_aslp_tpu.gmm import MonophoneTrainer, MonoTrainOptions
    from kaldi_aslp_tpu.gmm.deltas import DeltasTrainer, \
        DeltasTrainOptions
    from kaldi_aslp_tpu.recipes.timit_synth import \
        prepare_cd_phone_system

    c = _tiny_corpus()
    lang = c["lang"]
    G = arpa_to_fst(c["arpa"], lang.words)
    mono = MonophoneTrainer(lang, opts=MonoTrainOptions(
        num_iters=3, totgauss=120, realign_iters="1 2"))
    am0, tm0 = mono.train(c["train_feats"], c["train_texts"])
    alis0 = mono.align(am0, c["train_feats"], c["train_texts"])
    tri = DeltasTrainer(lang, mono.topo, DeltasTrainOptions(
        num_iters=3, totgauss=240, num_leaves=60, realign_iters="2",
        tree_min_gain=5.0))
    tri.train(c["train_feats"], c["train_texts"], tm0, alis0)

    targets, num_pdfs, hclg, lut = prepare_cd_phone_system(
        lang, tri.trans_model, tri._final_alignments,
        c["train_feats"], G, num_leaves=40, method="equal",
        min_gain=5.0)
    assert 1 < num_pdfs <= 40
    for u, t in targets.items():
        assert len(t) == len(tri._final_alignments[u])
        assert t.min() >= 0 and t.max() < num_pdfs
    assert hclg.num_states > 0 and hclg.num_arcs > 0
    assert lut.max() < num_pdfs
    # every emitting arc's pdf is resolvable through the lut
    tids = {a.ilabel for s in range(hclg.num_states)
            for a in hclg.arcs[s] if a.ilabel > 0}
    assert tids and max(tids) < len(lut)


def test_cd_phone_stat_methods_agree_on_segments():
    """equal/kmeans/viterbi produce stats for the same context windows
    (they differ in the summary, not the segmentation)."""
    from kaldi_aslp_tpu.gmm import MonophoneTrainer, MonoTrainOptions
    from kaldi_aslp_tpu.tree.cd_phone import acc_tree_stats_cd_phone

    c = _tiny_corpus()
    lang = c["lang"]
    mono = MonophoneTrainer(lang, opts=MonoTrainOptions(
        num_iters=3, totgauss=120, realign_iters="1 2"))
    am0, tm0 = mono.train(c["train_feats"], c["train_texts"])
    alis = mono.align(am0, c["train_feats"], c["train_texts"])
    keys = {}
    for method in ("equal", "kmeans", "viterbi"):
        stats = {}
        for u in list(c["train_feats"])[:6]:
            stats = acc_tree_stats_cd_phone(
                c["train_feats"][u], alis[u], tm0, method=method,
                stats=stats)
        keys[method] = set(stats)
    assert keys["equal"] == keys["kmeans"] == keys["viterbi"]


def test_pinyin_lexicon_and_syllable_units():
    from kaldi_aslp_tpu.fst import Lang, Lexicon
    from kaldi_aslp_tpu.ops.syllable import phones_to_syllables
    from kaldi_aslp_tpu.recipes.hkust_synth import (
        INITIALS,
        FINALS,
        TONES,
        make_pinyin_lexicon,
        phone_param_table,
    )
    from kaldi_aslp_tpu.recipes.syllable import prepare_syllable_units

    lex_text = make_pinyin_lexicon(60)
    params = phone_param_table()
    finals = {f"{f}{t}" for f in FINALS for t in TONES}
    for line in lex_text.strip().split("\n"):
        parts = line.split()
        if parts[0] == "<SIL>":
            continue
        # every phone is a known initial or tonal final, and the
        # sequence syllabifies (initial always followed by a final)
        for p in parts[1:]:
            assert p in params
            assert p in finals or p in INITIALS
        sylls = phones_to_syllables(parts[1:])
        for s in sylls:
            assert s[-1].isdigit()

    lex = Lexicon.from_text(lex_text)
    units = prepare_syllable_units(
        lex, [["W00001", "W00002"]] * 3, bind_thresh=2,
        keep_phones=("SIL",))
    # binding maps every raw syllable somewhere, and the bound lexicon
    # builds a Lang whose phones are the syllable units
    syl_lang = Lang.build(units.lexicon)
    assert len(syl_lang.lexicon.phone_set()) >= 2
    for w, prons in units.lexicon.prons.items():
        for pron in prons:
            for s in pron:
                assert s == "SIL" or s[-1].isdigit()


def test_hkust_corpus_tones_are_pitch_only():
    """Tone variants of a final share formants and differ only in the
    f0 multiplier — the Mandarin cue structure the recipe models."""
    from kaldi_aslp_tpu.recipes.hkust_synth import (
        FINALS,
        TONES,
        phone_param_table,
    )

    params = phone_param_table()
    for f in FINALS:
        rows = [params[f"{f}{t}"] for t in TONES]
        f1s = {r[0] for r in rows}
        f2s = {r[1] for r in rows}
        f0s = {r[3] for r in rows}
        assert len(f1s) == 1 and len(f2s) == 1
        assert len(f0s) == len(TONES)
