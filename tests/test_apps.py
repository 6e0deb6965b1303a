"""VAD / KWS / decodable-bridge / CTC-graph tests (reference:
src/aslp-vad/roc-test.cc pattern, keyword-spot behavior,
nnet-decodable semantics, aslp-make-ctc-transducer)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kaldi_aslp_tpu.vad import (
    EnergyVad,
    NnetVad,
    VadOptions,
    auc,
    eer,
    roc_curve,
    select_frames,
    ali_to_sil_targets,
)
from kaldi_aslp_tpu.kws import KeywordSpotter, KwsOptions
from kaldi_aslp_tpu.decoder.decodable import (
    NnetForwardOptions,
    PdfPrior,
    nnet_forward,
)
from kaldi_aslp_tpu.fst import Lang, Lexicon, make_unigram_grammar
from kaldi_aslp_tpu.fst.ctc_graph import ctc_lut, make_ctc_decode_graph
from kaldi_aslp_tpu.decoder import PackedGraph, ViterbiDecoder
from kaldi_aslp_tpu.models import Nnet


def test_energy_vad_fsm():
    opts = VadOptions(frame_length_ms=10, speech_trigger_ms=30,
                      silence_trigger_ms=50, lookback_ms=20,
                      energy_threshold=5.0)
    vad = EnergyVad(opts)
    # 20 silent frames, 20 loud, 20 silent
    frames = np.concatenate([
        0.1 * np.ones((20, 100)), 50 * np.ones((20, 100)),
        0.1 * np.ones((20, 100)),
    ])
    mask = vad.detect(frames)
    assert not mask[:15].any()          # leading silence
    assert mask[25:38].all()            # speech interior
    assert not mask[-10:].any()         # trailing silence (after trigger)
    # lookback: a couple frames before the trigger marked speech
    first_speech = np.where(mask)[0][0]
    assert first_speech <= 20


def test_nnet_vad():
    post = np.zeros((30, 3))
    post[:10, 0] = 0.9   # silence pdf dominant
    post[10:20, 1] = 0.9
    post[20:, 0] = 0.9
    vad = NnetVad(VadOptions(frame_length_ms=10, speech_trigger_ms=20,
                             silence_trigger_ms=30, lookback_ms=0,
                             sil_pdf_ids="0"))
    mask = vad.detect_from_posteriors(post)
    assert mask[12:20].all() and not mask[:8].any()
    tgt = ali_to_sil_targets(np.array([0, 1, 2, 0]), [0])
    np.testing.assert_array_equal(tgt, [0, 1, 1, 0])
    sel = select_frames(np.arange(8).reshape(4, 2), [1, 0, 1, 0])
    np.testing.assert_array_equal(sel, [[0, 1], [4, 5]])


def test_roc_auc_eer(rng):
    pos = rng.randn(500) + 2.0
    neg = rng.randn(500)
    scores = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones(500, bool), np.zeros(500, bool)])
    a = auc(scores, labels)
    assert 0.88 < a < 0.99
    e = eer(scores, labels)
    assert 0.02 < e < 0.25
    pts = roc_curve(scores, labels)
    assert pts[0].tpr >= pts[-1].tpr  # monotone-ish ordering


def test_keyword_spotter(rng):
    # posterior stream over 5 units; keyword = [2, 3]
    T = 40
    post = np.full((T, 5), 0.02)
    post[:, 0] = 0.9  # filler unit
    post[15:20, :] = 0.02
    post[15:20, 2] = 0.9   # unit 2 active
    post[20:25, :] = 0.02
    post[20:25, 3] = 0.9   # then unit 3
    post /= post.sum(1, keepdims=True)
    spotter = KeywordSpotter({"hello": [2, 3]},
                             KwsOptions(confidence_threshold=0.3))
    hits = spotter.spot(post)
    assert len(hits) == 1
    h = hits[0]
    assert h.keyword == "hello"
    assert 14 <= h.start_frame <= 16 and 19 <= h.end_frame <= 26
    assert h.confidence > 0.5
    # no hit on a stream without the keyword
    assert spotter.spot(np.tile(post[:5], (2, 1))) == []


def test_pdf_prior_and_forward(rng):
    net = Nnet.from_proto(
        "<AffineTransform> <InputDim> 4 <OutputDim> 6 <ParamStddev> 0.1"
    )
    params = net.init(jax.random.PRNGKey(0))
    alis = {"u1": np.array([0, 0, 1, 2]), "u2": np.array([3, 3, 3, 4])}
    prior = PdfPrior.from_alignments(alis, num_pdfs=6)
    assert prior.log_priors.shape == (6,)
    counts = np.bincount(np.concatenate(list(alis.values())),
                         minlength=6)
    seen = counts > 0
    # among seen pdfs the most frequent has the largest prior;
    # unseen pdfs are removed from the search (+1e10 sentinel)
    assert prior.log_priors[seen].argmax() == counts[seen].argmax()
    assert (prior.log_priors[~seen] > 1e9).all()

    feats = rng.randn(10, 4).astype(np.float32)
    scores = nnet_forward(net, params, feats,
                          NnetForwardOptions(), prior)
    assert scores.shape == (10, 6)
    # skip-frame copy mode: rows replicated
    scores_skip = nnet_forward(
        net, params, feats, NnetForwardOptions(skip_width=2), prior
    )
    assert scores_skip.shape == (10, 6)
    np.testing.assert_allclose(scores_skip[0], scores_skip[1], atol=1e-5)


def test_ctc_decode_graph(rng):
    """Decode a synthetic CTC posterior stream over the TLG graph."""
    lex = Lexicon.from_text("YES Y\nNO N\n<SIL> SIL\n")
    lang = Lang.build(lex)
    G = make_unigram_grammar({"YES": 0.5, "NO": 0.5}, lang.words)
    tlg = make_ctc_decode_graph(lang, G)
    num_outputs = len(lang.phones)  # blank shares id space with phones
    packed = PackedGraph.from_fst(tlg)
    lut = ctc_lut(num_outputs)
    dec = ViterbiDecoder(packed, lut, acoustic_scale=1.0)

    y, n = lang.phones.id("Y"), lang.phones.id("N")
    # frame stream: blank blank Y Y blank N blank
    seq = [0, 0, y, y, 0, n, 0, 0]
    T, V = len(seq), num_outputs
    ll = np.full((T, V), np.log(0.01), np.float32)
    for t, u in enumerate(seq):
        ll[t, u] = np.log(0.9)
    words, ali, score = dec.decode(ll)
    assert [lang.words.sym(w) for w in words] == ["YES", "NO"]
