"""SAT/fMLLR loop, resampling, noise augmentation tests (reference:
steps/train_sat.sh, src/feat/resample.cc, aslp-bin/aslp-wav-noise)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.feats.resample import add_noise, resample_waveform
from kaldi_aslp_tpu.fst import Lang, Lexicon
from kaldi_aslp_tpu.gmm import MonophoneTrainer, MonoTrainOptions, \
    gmm_loglikes
from kaldi_aslp_tpu.gmm.sat import (
    SatOptions,
    SatTrainer,
    apply_speaker_transforms,
    estimate_speaker_transforms,
)


def test_resample_preserves_tone():
    sr_in, sr_out = 16000.0, 8000.0
    t = np.arange(16000) / sr_in
    wave = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample_waveform(wave, sr_in, sr_out)
    assert len(out) == 8000
    # 440 Hz peak survives in the downsampled spectrum
    spec = np.abs(np.fft.rfft(out[400:4400] * np.hanning(4000)))
    freqs = np.fft.rfftfreq(4000, 1 / sr_out)
    assert abs(freqs[spec.argmax()] - 440) < 5
    # energy roughly preserved (interior)
    assert 0.3 < np.mean(out[100:-100] ** 2) / 0.5 < 1.5


def test_resample_upsample_roundtrip():
    # composite tone well inside the 4 kHz band: down→up→down must be
    # near-identity (white noise at the band edge is NOT preserved by a
    # 6-zero sinc — that's expected filter behavior)
    t = np.arange(4000) / 16000.0
    wave = (np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(
        2 * np.pi * 1000 * t) + 0.3 * np.sin(2 * np.pi * 2500 * t)
    ).astype(np.float32)
    lo = resample_waveform(wave, 16000.0, 8000.0)
    back = resample_waveform(lo, 8000.0, 16000.0)
    again = resample_waveform(back, 16000.0, 8000.0)
    err = np.abs(lo[50:-50] - again[50:-50]).max()
    assert err < 0.05, err


def test_add_noise_snr():
    rng = np.random.RandomState(1)
    speech = (1000 * rng.randn(8000)).astype(np.float32)
    noise = (500 * rng.randn(3000)).astype(np.float32)
    noisy = add_noise(speech, noise, snr_db=10.0, seed=3)
    assert noisy.shape == speech.shape
    added = noisy - speech
    snr = 10 * np.log10(np.mean(speech ** 2) / np.mean(added ** 2))
    assert abs(snr - 10.0) < 0.5


def _speaker_corpus(rng):
    """Two 'speakers' with a constant feature-space shift each."""
    lang = Lang.build(Lexicon.from_text("YES Y\nNO N\n"))
    centers = {"Y": np.array([3.0, 0.0]), "N": np.array([-3.0, 0.0]),
               "SIL": np.array([0.0, 3.0])}
    shifts = {"spkA": np.array([1.0, -0.8]),
              "spkB": np.array([-1.2, 0.6])}
    feats, texts, utt2spk = {}, {}, {}
    for si, spk in enumerate(sorted(shifts)):
        for u in range(8):
            words = [("YES" if rng.rand() < 0.5 else "NO")
                     for _ in range(3)]
            seq = ["SIL"]
            for w in words:
                seq.append("Y" if w == "YES" else "N")
                seq.append("SIL")
            fr = [centers[ph] + shifts[spk]
                  + 0.4 * rng.randn(rng.randint(6, 12), 2)
                  for ph in seq]
            key = f"{spk}_u{u}"
            feats[key] = np.concatenate(fr).astype(np.float32)
            texts[key] = words
            utt2spk[key] = spk
    return lang, feats, texts, utt2spk


@pytest.mark.slow
def test_sat_training_improves_likelihood(rng):
    lang, feats, texts, utt2spk = _speaker_corpus(rng)
    mono = MonophoneTrainer(
        lang, opts=MonoTrainOptions(num_iters=6, totgauss=40,
                                    realign_iters="1 2 3 4 5"),
    )
    am, tm = mono.train(feats, texts)
    alis = mono.align(am, feats, texts)
    pdf_alis = {u: tm.alignment_to_pdfs(a) for u, a in alis.items()}

    transforms = estimate_speaker_transforms(am, feats, pdf_alis,
                                             utt2spk)
    assert set(transforms) == {"spkA", "spkB"}
    # the two speaker transforms must differ (different shifts)
    assert np.abs(transforms["spkA"] - transforms["spkB"]).max() > 0.1

    import jax.numpy as jnp
    def total_ll(model, f):
        packed = model.pack()
        tot = 0.0
        for u, pdfs in pdf_alis.items():
            n = min(len(pdfs), len(f[u]))
            ll = np.asarray(gmm_loglikes(
                jnp.asarray(f[u][:n].astype(np.float32)), *packed))
            tot += ll[np.arange(n), pdfs[:n]].sum()
        return tot

    ll_before = total_ll(am, feats)
    sat = SatTrainer(mono, SatOptions(num_outer_iters=2,
                                      fmllr_min_count=20.0))
    am_sat, transforms = sat.train(am, feats, texts, utt2spk)
    adapted = apply_speaker_transforms(feats, transforms, utt2spk)
    ll_after = total_ll(am_sat, adapted)
    assert ll_after > ll_before, (ll_before, ll_after)
