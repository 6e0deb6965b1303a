"""VAD decode session + alignment conversion tests (reference:
decode-thread.cc VAD loop, aslp-convert-ali)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.fst import Lang, Lexicon, make_unigram_grammar
from kaldi_aslp_tpu.fst.ctc_graph import ctc_lut, make_ctc_decode_graph
from kaldi_aslp_tpu.decoder import PackedGraph
from kaldi_aslp_tpu.decoder.online import OnlineViterbiDecoder
from kaldi_aslp_tpu.online import OnlineFeatureOptions
from kaldi_aslp_tpu.online.vad_pipeline import OnlineVadFeaturePipeline
from kaldi_aslp_tpu.online.vad_session import VadDecodeSession
from kaldi_aslp_tpu.vad import EnergyVad, VadOptions
from kaldi_aslp_tpu.gmm import MonophoneTrainer, MonoTrainOptions
from kaldi_aslp_tpu.hmm.convert_ali import (
    convert_alignment,
    phone_segments,
)


def test_vad_session_two_utterances(rng):
    lex = Lexicon.from_text("YES Y\nNO N\n<SIL> SIL\n")
    lang = Lang.build(lex)
    G = make_unigram_grammar({"YES": 0.5, "NO": 0.5}, lang.words)
    packed = PackedGraph.from_fst(make_ctc_decode_graph(lang, G))
    lut = ctc_lut(len(lang.phones))
    yid = lang.phones.id("Y")
    V = len(lang.phones)

    def acoustic_fn(frames):
        # every speech frame is a confident Y (VAD already gated)
        ll = np.full((len(frames), V), np.log(0.05), np.float32)
        ll[:, yid] = np.log(0.8)
        return ll

    session = VadDecodeSession(
        OnlineVadFeaturePipeline(
            OnlineFeatureOptions(feature_type="fbank", num_mel_bins=23,
                                 apply_cmn=False),
            EnergyVad(VadOptions(speech_trigger_ms=30,
                                 silence_trigger_ms=60,
                                 energy_threshold=8.0)),
        ),
        OnlineViterbiDecoder(packed, lut, 1.0, chunk_bucket=8),
        acoustic_fn, lang.words, chunk_frames=8,
    )
    sr = 16000
    t = np.arange(sr // 2) / sr
    tone = (5000 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    quiet = (2 * rng.randn(sr)).astype(np.float32)
    # [sil tone sil tone sil]: two utterances
    audio = np.concatenate([quiet, tone, quiet, tone, quiet])
    events = []
    for i in range(0, len(audio), 4000):
        events.extend(session.accept_samples(audio[i:i + 4000]))
    events.append(session.finalize())
    finals = [e for e in events if e["type"] == "final" and e["text"]]
    assert len(finals) >= 2, events
    assert all("YES" in f["text"] for f in finals)


def _mono_system(rng, num_states=3):
    lex = Lexicon.from_text("YES Y\nNO N\n")
    lang = Lang.build(lex)
    trainer = MonophoneTrainer(lang)
    return lang, trainer


def test_phone_segments_and_convert(rng):
    lang, mono = _mono_system(rng)
    tm = mono.trans_model
    graph = mono.compiler.compile(["YES", "NO"])
    from kaldi_aslp_tpu.decoder import equal_align

    ali = equal_align(graph, tm, 40)
    segs = phone_segments(tm, ali)
    assert sum(l for _, _, l in segs) == 40
    names = [lang.phones.sym(p) for p, _, _ in segs]
    assert "Y" in names and "N" in names

    # mono → mono (same tm): phone segmentation must be preserved
    ali2 = convert_alignment(ali, tm, tm)
    assert len(ali2) == 40
    segs2 = phone_segments(tm, ali2)
    assert [(p, l) for p, _, l in segs] == [(p, l) for p, _, l in segs2]
    # all tids valid
    assert (np.asarray(ali2) >= 1).all()
    assert (np.asarray(ali2) <= tm.num_transition_ids).all()
