"""Online/streaming tests: incremental == offline equivalence, endpoint
rules, and a real TCP loopback session (reference: src/aslp-online/)."""

import asyncio
import json

import numpy as np
import pytest
import jax.numpy as jnp

from kaldi_aslp_tpu.online import (
    DecodeSession,
    OnlineEndpointConfig,
    OnlineFeatureOptions,
    OnlineFeaturePipeline,
    OnlineServerOptions,
    OnlineTcpServer,
    endpoint_detected,
)
from kaldi_aslp_tpu.decoder.online import OnlineViterbiDecoder
from kaldi_aslp_tpu.decoder import PackedGraph, ViterbiDecoder
from kaldi_aslp_tpu.fst import Lang, Lexicon, make_unigram_grammar
from kaldi_aslp_tpu.fst.ctc_graph import ctc_lut, make_ctc_decode_graph
from kaldi_aslp_tpu.feats import Fbank, FrameExtractionOptions, \
    MelBanksOptions


def test_online_features_match_offline(rng):
    opts = OnlineFeatureOptions(feature_type="fbank", num_mel_bins=23,
                                apply_cmn=False)
    pipe = OnlineFeaturePipeline(opts)
    wave = (1000 * rng.randn(16000)).astype(np.float32)
    # stream in uneven chunks
    got = []
    for start in range(0, len(wave), 1234):
        got.append(pipe.accept_waveform(wave[start:start + 1234]))
    got = np.concatenate(got)
    offline = np.asarray(Fbank(
        FrameExtractionOptions(dither=0.0),
        MelBanksOptions(num_bins=23),
    )(wave))
    assert got.shape == offline.shape
    np.testing.assert_allclose(got, offline, rtol=1e-4, atol=1e-4)


def test_endpoint_rules():
    cfg = OnlineEndpointConfig()
    # mostly silence, 5.5s trailing → rule 1 (no final state needed)
    assert endpoint_detected(cfg, 600, 550)
    # decoded + short trailing silence → no endpoint
    assert not endpoint_detected(cfg, 100, 20)
    # 1.1s trailing silence + good final state → rule 3
    assert endpoint_detected(cfg, 300, 110, final_relative_cost=0.0)
    # 1.1s trailing silence but NO reachable final state: rules 2/3
    # gated off by max_relative_cost (reference: online-endpoint.h:155-156)
    assert not endpoint_detected(cfg, 300, 110)
    # ... until silence reaches rule 4's 2s threshold
    assert endpoint_detected(cfg, 300, 210)
    # rule 2 fires at 0.6s only when the final state is very good
    assert endpoint_detected(cfg, 300, 60, final_relative_cost=1.0)
    assert not endpoint_detected(cfg, 300, 60, final_relative_cost=5.0)
    # very long utterance → rule 5
    assert endpoint_detected(cfg, 2100, 0)
    assert not endpoint_detected(cfg, 0, 0)


def _ctc_setup():
    lex = Lexicon.from_text("YES Y\nNO N\n<SIL> SIL\n")
    lang = Lang.build(lex)
    G = make_unigram_grammar({"YES": 0.5, "NO": 0.5}, lang.words)
    tlg = make_ctc_decode_graph(lang, G)
    packed = PackedGraph.from_fst(tlg)
    lut = ctc_lut(len(lang.phones))
    return lang, packed, lut


def _ctc_scores(lang, seq):
    V = len(lang.phones)
    ll = np.full((len(seq), V), np.log(0.01), np.float32)
    for t, u in enumerate(seq):
        ll[t, u] = np.log(0.9)
    return ll


def test_online_viterbi_matches_batch():
    lang, packed, lut = _ctc_setup()
    y, n = lang.phones.id("Y"), lang.phones.id("N")
    seq = [0, y, y, 0, 0, n, n, 0, y, 0]
    ll = _ctc_scores(lang, seq)

    batch_dec = ViterbiDecoder(packed, lut, acoustic_scale=1.0)
    words_b, ali_b, score_b = batch_dec.decode(ll)

    online = OnlineViterbiDecoder(packed, lut, acoustic_scale=1.0,
                                  chunk_bucket=4)
    online.advance_decoding(ll[:3])
    online.advance_decoding(ll[3:7])
    partial = online.get_partial_path()
    online.advance_decoding(ll[7:])
    words_o, ali_o, score_o = online.finalize_decoding()

    assert words_o == words_b
    np.testing.assert_array_equal(ali_o, ali_b)
    assert score_o == pytest.approx(score_b, rel=1e-5)
    # partial after 7 frames should already contain YES NO
    assert [lang.words.sym(w) for w in partial][:2] == ["YES", "NO"]


def test_decode_session_and_tcp_server(rng):
    """Full loopback: PCM bytes → session → JSON events."""
    lang, packed, lut = _ctc_setup()
    y = lang.phones.id("Y")

    # acoustic_fn: fake "NN" mapping energy bands to CTC posteriors —
    # high-energy frames → Y, low → blank
    V = len(lang.phones)

    def acoustic_fn(frames):
        energy = frames[:, 0]  # first fbank bin as proxy
        ll = np.full((len(frames), V), np.log(0.05), np.float32)
        loud = energy > np.log(100.0)
        ll[loud, y] = np.log(0.9)
        ll[~loud, 0] = np.log(0.9)
        return ll

    def make_session():
        return DecodeSession(
            OnlineFeaturePipeline(OnlineFeatureOptions(
                feature_type="fbank", num_mel_bins=23, apply_cmn=False,
            )),
            OnlineViterbiDecoder(packed, lut, acoustic_scale=1.0,
                                 chunk_bucket=16),
            acoustic_fn, lang.words, chunk_frames=16,
        )

    # synthesize: silence, tone, silence
    sr = 16000
    quiet = 10 * rng.randn(sr // 2)
    t = np.arange(sr) / sr
    loud = 5000 * np.sin(2 * np.pi * 300 * t)
    wave = np.concatenate([quiet, loud, quiet]).astype(np.float32)
    pcm = np.clip(wave, -32768, 32767).astype("<i2").tobytes()

    async def run():
        server = OnlineTcpServer(
            make_session, OnlineServerOptions(port=0)
        )
        port = await server.start()
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        for i in range(0, len(pcm), 8000):
            writer.write(pcm[i:i + 8000])
            await writer.drain()
        writer.write_eof()
        lines = []
        while True:
            line = await reader.readline()
            if not line:
                break
            lines.append(json.loads(line))
        writer.close()
        await server.stop()
        return lines

    events = asyncio.run(run())
    assert events, "no events received"
    assert events[-1]["type"] == "final"
    assert "YES" in events[-1]["text"]
    assert any(e["type"] == "partial" for e in events)
