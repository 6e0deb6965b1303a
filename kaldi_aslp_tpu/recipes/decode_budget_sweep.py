"""Frontier-budget (max_active) vs WER sweep on the hard corpus.

The decoder's per-frame cost is bound by the frontier budget K and the
arc budget A = 4K, independent of graph size (decoder/beam.py) — the
round-3 numbers showed ~260 us per stream-frame at K=2048, which caps
bulk 10 s-utterance decode at ~37 audio-s/s.  K=2048 was sized for 60 s
word-loop stress decodes; this harness measures what the hard corpus
actually needs: WER on the DEV set (tuning set — the test set stays
untouched) at descending K, plus wall time, so the throughput
configuration is chosen on evidence (reference role: the
--max-active/--beam operating point of decode.sh + the nj-way
throughput of aslp_scripts/aslp_nnet/decode.sh:129-134).

Run: python -m kaldi_aslp_tpu.recipes.decode_budget_sweep [--small]
     [--budgets=2048,1024,512,256,128]
"""

from __future__ import annotations

import sys
import time
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from kaldi_aslp_tpu.utils.log import get_logger
from kaldi_aslp_tpu.fst import make_decode_graph
from kaldi_aslp_tpu.fst.lang import arpa_to_fst
from kaldi_aslp_tpu.gmm import MonophoneTrainer, gmm_loglikes
from kaldi_aslp_tpu.decoder import PackedGraph
from kaldi_aslp_tpu.decoder.beam import BeamSearchDecoder, CsrGraph
from kaldi_aslp_tpu.fst.ctc_graph import ctc_lut
from kaldi_aslp_tpu.ops.edit_distance import score_utterances
from kaldi_aslp_tpu.recipes.hard_corpus import build_corpus
from kaldi_aslp_tpu.recipes.hard_ladder import _Scale, GMM_BEAM
from kaldi_aslp_tpu.recipes.score_util import decode_wer_beam

logger = get_logger("budget-sweep")


def run(scale: str = "medium",
        budgets: Optional[List[int]] = None,
        corpus: Optional[dict] = None) -> Dict[int, float]:
    budgets = budgets or [2048, 1024, 512, 256, 128]
    sc = _Scale(scale)
    if corpus is None:
        corpus = build_corpus(sc.corpus, num_train=sc.num_train,
                              num_test=sc.num_test, num_dev=sc.num_dev,
                              lm_pool_mult=sc.lm_mult)
    lang = corpus["lang"]
    G = arpa_to_fst(corpus["arpa"], lang.words)
    mono = MonophoneTrainer(lang, opts=sc.mono)
    am, tm = mono.train(corpus["train_feats"], corpus["train_texts"])
    hclg = make_decode_graph(lang, G, tm)
    lut = tm.alignment_to_pdfs(np.arange(tm.num_transition_ids + 1))
    packed = PackedGraph.from_fst(hclg)
    amp = am.pack()
    dev_feats = corpus["dev_feats"] or corpus["test_feats"]
    dev_texts = corpus["dev_texts"] or corpus["test_texts"]
    from kaldi_aslp_tpu.gmm.diag_gmm import corpus_loglikes
    dev_ll = corpus_loglikes(dev_feats, sorted(dev_feats), amp)
    refs = {u: [lang.words.id(w) for w in s]
            for u, s in dev_texts.items()}
    logger.info("graph: %d states / %d arcs; %d dev utts",
                hclg.num_states, len(packed.src), len(dev_ll))

    results: Dict[int, float] = {}
    for K in budgets:
        t0 = time.time()
        wer, _ = decode_wer_beam(packed, lut, dev_ll, refs, 0.1,
                                 range(4, 16), beam=GMM_BEAM,
                                 max_active=K)
        dt = time.time() - t0
        results[K] = wer
        logger.info("max_active %5d: dev WER %6.2f  (%.1fs)", K, wer, dt)
    print("BUDGET_SWEEP " + " ".join(f"{k}={v:.2f}"
                                     for k, v in results.items()))
    return results


def nn_budget_sweep(ctc, dev_feats: Dict[str, "np.ndarray"],
                    dev_texts: Dict[str, list],
                    budgets: Optional[List[int]] = None
                    ) -> Dict[int, float]:
    """Frontier-budget vs WER sweep on a TRAINED CTC system's dev set.

    The GMM-side sweep (run() above) measures the weak-acoustics case:
    beam-96 monophone loglikes need the full budget.  This measures the
    case the tuned bulk-decode operating point (bench decode10s_tuned_*,
    K=512) is licensed on: sharp NN posteriors at beam 32, where the
    beam itself keeps the live frontier small and reduced K should hold
    WER.  Decodes with the recipe's OWN settings (acoustic scale,
    prior division, lfr) so the K column is the only variable."""
    budgets = budgets or [2048, 1024, 512, 256]
    csr = CsrGraph.from_packed(PackedGraph.from_fst(ctc.tlg))
    lut = ctc_lut(len(ctc.lang.phones) + 1)
    dev_logp = {u: ctc.posteriors(f) - ctc.log_priors
                for u, f in dev_feats.items()}
    results: Dict[int, float] = {}
    for K in budgets:
        dec = BeamSearchDecoder(csr, lut,
                                acoustic_scale=ctc.opts.acoustic_scale,
                                beam=ctc.opts.decode_beam or 32.0,
                                max_active=K)
        hyps = {}
        failures = 0
        t0 = time.time()
        for u in sorted(dev_logp):
            try:
                words_out, _, _ = dec.decode(jnp.asarray(dev_logp[u]))
            except RuntimeError as e:
                # scored as a full deletion — log it so a degraded
                # column is distinguishable from genuine WER loss
                logger.warning("decode failed at K=%d on %s: %s",
                               K, u, e)
                failures += 1
                words_out = []
            hyps[u] = [ctc.lang.words.sym(w) for w in words_out]
        stats = score_utterances(dev_texts, hyps)
        results[K] = stats.wer
        logger.info("NN max_active %5d: dev WER %6.2f  (%.1fs%s)",
                    K, stats.wer, time.time() - t0,
                    f", {failures} decode failures" if failures else "")
    print("NN_BUDGET_SWEEP_DEV " + " ".join(
        f"{k}={v:.2f}" for k, v in results.items()))
    return results


if __name__ == "__main__":
    scale = "small" if "--small" in sys.argv[1:] else "medium"
    budgets = None
    for a in sys.argv[1:]:
        if a.startswith("--budgets="):
            budgets = [int(x) for x in a.split("=", 1)[1].split(",")]
    run(scale, budgets)
