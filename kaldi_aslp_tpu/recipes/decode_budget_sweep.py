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
    dev_ll = {u: np.asarray(gmm_loglikes(jnp.asarray(f), *amp))
              for u, f in dev_feats.items()}
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


if __name__ == "__main__":
    scale = "small" if "--small" in sys.argv[1:] else "medium"
    budgets = None
    for a in sys.argv[1:]:
        if a.startswith("--budgets="):
            budgets = [int(x) for x in a.split("=", 1)[1].split(",")]
    run(scale, budgets)
