"""Hard-corpus benchmark tests: the parity benchmark that can FAIL.

The yesno/ls_synth/rm_synth tasks saturate (0-6%% WER floors), so no
acoustic-model or pruning regression was detectable end-to-end (round-2
verdict, missing #1).  The hard corpus (recipes/hard_corpus.py:
confusable clustered phones, disjoint train/test speakers with ±12%%
vocal-tract warp, swept-SNR noise, minimal-pair lexicon, held-out LM
pool) lands the mono stage mid-range; these tests assert BOTH
properties that make it a benchmark:

  * non-saturation — the WER is far from 0 and far from chance;
  * sensitivity — a deliberately degraded pruning setting MOVES it
    (reference role: the published ladders egs/rm/s5/RESULTS:6-15 move
    when the system regresses; a benchmark at its floor cannot).

The full mono→tri→DNN→CTC ladder runs at larger scale outside the
suite (python -m kaldi_aslp_tpu.recipes.hard_ladder); the ordering
evidence lives in STATUS.md.
"""

import os

import numpy as np
import pytest

from kaldi_aslp_tpu.recipes import hard_ladder
from kaldi_aslp_tpu.recipes.hard_corpus import (
    HardCorpusOptions,
    build_corpus,
    make_lexicon,
    pruned_bigram_arpa,
    NUM_PHONES,
    CLUSTER_SIZE,
    PHONES,
)


def test_lexicon_minimal_pairs_are_in_cluster():
    opts = HardCorpusOptions(num_words=60, minimal_pair_frac=0.5)
    lex_text = make_lexicon(opts)
    prons = {}
    for line in lex_text.strip().split("\n"):
        parts = line.split()
        if parts[0] == "<SIL>":
            continue
        prons[parts[0]] = tuple(PHONES.index(p) for p in parts[1:])
    # at least minimal_pair_frac of words have a single-phone mutation
    # partner whose differing phone is in the SAME cluster
    all_prons = set(prons.values())
    n_pairs = 0
    for p in all_prons:
        for i in range(len(p)):
            for k in range(CLUSTER_SIZE):
                sib = (p[i] // CLUSTER_SIZE) * CLUSTER_SIZE + k
                if sib != p[i] and p[:i] + (sib,) + p[i + 1:] in all_prons:
                    n_pairs += 1
                    break
            else:
                continue
            break
    assert n_pairs >= 0.4 * len(all_prons)


def test_lm_pool_is_heldout():
    """The ARPA comes from a text pool disjoint from the acoustic
    transcripts (librispeech external-LM protocol)."""
    opts = HardCorpusOptions(num_words=50)
    c = build_corpus(opts, num_train=8, num_test=4, lm_pool_mult=3)
    assert c["arpa"].startswith("\\data\\")
    # train/test speakers disjoint
    tr_spk = set(c["train_utt2spk"].values())
    te_spk = set(c["test_utt2spk"].values())
    assert not (tr_spk & te_spk)


def test_dev_split_three_disjoint_speaker_sets():
    """num_dev > 0 emits a dev set with its OWN speaker pool: tuning on
    dev cannot leak test speakers (egs/timit dev/test discipline)."""
    opts = HardCorpusOptions(num_words=40, num_train_speakers=4,
                             num_test_speakers=2, num_dev_speakers=2)
    c = build_corpus(opts, num_train=6, num_test=3, num_dev=4,
                     lm_pool_mult=2)
    assert len(c["dev_feats"]) == 4 and len(c["dev_texts"]) == 4
    tr = set(c["train_utt2spk"].values())
    te = set(c["test_utt2spk"].values())
    dv = set(c["dev_utt2spk"].values())
    assert not (tr & te) and not (tr & dv) and not (te & dv)
    # prefixes keep the three sets distinguishable in scoring logs
    assert all(u.startswith("dv") for u in c["dev_feats"])


@pytest.mark.slow
def test_mono_stage_nonsaturated_and_pruning_sensitive():
    results = hard_ladder.run("/tmp/exp_hard_test", scale="small",
                              stages=["mono"])
    wer = results["mono"]
    # non-saturated: a regression can RAISE it, an improvement can
    # LOWER it — neither holds at 0% or at chance
    assert 10.0 < wer < 95.0, wer
    healthy, degraded = hard_ladder.pruning_sensitivity(
        hard_ladder.run.artifacts)
    assert degraded >= healthy + 1.0, (healthy, degraded)

    # frontier-budget sensitivity: weak-GMM acoustics at beam 96 NEED
    # the full budget — reducing K degrades WER monotonically (never
    # improves it) and boundedly.  Measured at medium scale
    # (BUDGET_SWEEP_DEV: 32.32 @ K=2048 -> 40.78 @ K=256), which is
    # why the tuned bulk-decode operating point (K=512, bench
    # decode10s_tuned_*) is licensed on SHARP NN acoustics
    # (NN_BUDGET_SWEEP_DEV on the CTC stage), not on GMM decodes.
    from kaldi_aslp_tpu.recipes.score_util import decode_wer_beam
    a = hard_ladder.run.artifacts
    big, _ = decode_wer_beam(a["packed0"], a["lut0"], a["test_ll0"],
                             a["refs"], 0.1, range(4, 16),
                             beam=hard_ladder.GMM_BEAM,
                             max_active=2048)
    small, _ = decode_wer_beam(a["packed0"], a["lut0"], a["test_ll0"],
                               a["refs"], 0.1, range(4, 16),
                               beam=hard_ladder.GMM_BEAM,
                               max_active=512)
    assert big - 0.2 <= small <= big + 8.0, (big, small)


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("KALDI_ASLP_RUN_MEDIUM"),
                    reason="multi-hour medium run; set "
                           "KALDI_ASLP_RUN_MEDIUM=1 to execute (manual "
                           "protocol — published rows live in STATUS.md)")
def test_medium_ladder_ordering():
    """The reference property the ladder exists to reproduce: each
    stage improves on the last (egs/rm/s5/RESULTS:6-15 mono 8.74 ->
    tri2b 2.98; egs/hkust/s5/RESULTS:13-18 DNN 39.42 -> LSTM 37.61).
    WER is 'lower is better', so the assertion chain is descending.

    KALDI_ASLP_MEDIUM_RESULTS=<run dir> asserts over a completed
    run's results.jsonl (the per-stage rows the ladder emits as they
    land) instead of re-running the multi-hour pipeline in-process —
    same corpus, same code, same rows as STATUS.md publishes."""
    rdir = os.environ.get("KALDI_ASLP_MEDIUM_RESULTS")
    if rdir:
        import json
        results = {}
        with open(os.path.join(rdir, "results.jsonl")) as f:
            for line in f:
                row = json.loads(line)
                assert row["scale"] == "medium", row
                results[row["stage"]] = row["test_wer"]
        assert set(results) >= {"mono", "tri", "dnn", "ctc"}, results
    else:
        results = hard_ladder.run("/tmp/exp_hard_medium",
                                  scale="medium")
    assert results["mono"] > results["tri"], results
    assert results["tri"] > results["dnn"], results
    assert results["dnn"] >= results["ctc"] - 2.0, results
