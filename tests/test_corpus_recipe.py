"""Corpus recipe runner on a synthesized disk corpus (the real-corpus
entry path: data dirs + lexicon file → pipeline → WER)."""

import os

import numpy as np
import pytest

from kaldi_aslp_tpu.io import DataDir, WaveData, write_wave
from kaldi_aslp_tpu.recipes.corpus import (
    CorpusRecipeOptions,
    run_corpus,
)
from kaldi_aslp_tpu.recipes.ctc import CtcRecipeOptions

SR = 8000
TONES = {"YES": (250.0, 1800.0), "NO": (140.0, 700.0)}


def _make_corpus(root, rng, num_utts, words_per_utt=3):
    wav_dir = os.path.join(root, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    d = DataDir(path=os.path.join(root, "data"))
    for u in range(num_utts):
        words = [("YES" if rng.rand() < 0.5 else "NO")
                 for _ in range(words_per_utt)]
        chunks = [np.zeros(int(0.15 * SR))]
        for w in words:
            f0, f1 = TONES[w]
            t = np.arange(int(0.25 * SR)) / SR
            chunks.append(np.hanning(len(t)) * (
                4000 * np.sin(2 * np.pi * f0 * t)
                + 2000 * np.sin(2 * np.pi * f1 * t)))
            chunks.append(np.zeros(int(0.12 * SR)))
        wave = np.concatenate(chunks) + 20 * rng.randn(
            sum(len(c) for c in chunks))
        path = os.path.join(wav_dir, f"u{u}.wav")
        write_wave(path, WaveData(float(SR),
                                  wave[None, :].astype(np.float32)))
        d.wav_scp[f"u{u}"] = path
        d.text[f"u{u}"] = " ".join(words)
        d.utt2spk[f"u{u}"] = f"spk{u % 2}"
    d.save()
    return d.path


def test_corpus_ctc_recipe(tmp_path, rng):
    train = _make_corpus(str(tmp_path / "train"), rng, 20)
    test = _make_corpus(str(tmp_path / "test"), rng, 6)
    lexicon = tmp_path / "lexicon.txt"
    lexicon.write_text("YES Y\nNO N\n<SIL> SIL\n")
    stats = run_corpus(
        train, test, str(tmp_path / "exp"),
        CorpusRecipeOptions(pipeline="ctc", lexicon=str(lexicon),
                            num_mel_bins=23),
        pipeline_opts=CtcRecipeOptions(model_type="blstm",
                                       hidden_dim=32, num_layers=1,
                                       learn_rate=0.05, max_iters=45,
                                       keep_lr_iters=40,
                                       num_streams=8),
    )
    assert stats.wer <= 15.0, stats.report()
