"""Shared decode+score helper for recipes: beam lattice decode with an
LMWT sweep (reference: aslp_scripts/aslp_nnet/decode.sh latgen +
score_basic.sh:49-80 sweep), with decode failures folded in as
deletions the way the reference's scoring does for empty 1-bests."""

from __future__ import annotations

import time
from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from kaldi_aslp_tpu.utils.log import get_logger
from kaldi_aslp_tpu.decoder.beam import BeamSearchDecoder, CsrGraph
from kaldi_aslp_tpu.decoder.lattice import score_lmwt_sweep
from kaldi_aslp_tpu.ops.edit_distance import score_utterances

logger = get_logger("score")


def decode_wer_beam(packed, lut, test_ll: Dict[str, np.ndarray],
                    refs: Dict[str, list], acoustic_scale: float,
                    lmwt_range, beam: float = 16.0,
                    max_active: int = 2048, lattice_beam: float = 8.0,
                    chunk: int = 128) -> Tuple[float, Dict]:
    """Beam-lattice decode + LMWT sweep; returns (best WER, sweep)."""
    dec = BeamSearchDecoder(CsrGraph.from_packed(packed), lut,
                            acoustic_scale=acoustic_scale, beam=beam,
                            max_active=max_active, chunk=chunk)
    lats = {}
    t_dec = t_audio = 0.0
    failed = []
    for u, ll in sorted(test_ll.items()):
        t0 = time.time()
        try:
            _, _, _, lat = dec.decode_lattice(
                jnp.asarray(ll), lattice_beam=lattice_beam)
            if not lat.arcs:
                raise RuntimeError("empty lattice")
            lats[u] = lat
        except RuntimeError:
            failed.append(u)   # scored as full deletion below
        t_dec += time.time() - t0
        t_audio += len(ll) * 0.01
    if failed:
        logger.warning("decode failed (no path within beam) on %d "
                       "utts: %s", len(failed), failed[:5])
    sweep = score_lmwt_sweep(lats, {u: refs[u] for u in lats},
                             lmwt_range=lmwt_range,
                             acoustic_scale_base=1.0)
    if failed:
        extra = score_utterances({u: refs[u] for u in failed},
                                 {u: [] for u in failed})
        for lmwt, st in sweep.items():
            st.deletions += extra.deletions
            st.ref_length += extra.ref_length
            st.num_sentences += extra.num_sentences
            st.num_wrong_sentences += extra.num_wrong_sentences
    best_lmwt = min(sweep, key=lambda k: sweep[k].wer)
    logger.info("decode RTF %.3f; best LMWT %s", t_dec / max(t_audio, 1e-9),
                best_lmwt)
    return sweep[best_lmwt].wer, sweep
