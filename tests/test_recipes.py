"""Recipe pipeline tests: hybrid DNN-HMM and phone-CTC end-to-end on
synthetic separable data (reference: run_dnn.sh / ctc chain roles)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.fst import Lang, Lexicon
from kaldi_aslp_tpu.recipes.hybrid import HybridRecipe, \
    HybridRecipeOptions
from kaldi_aslp_tpu.recipes.ctc import CtcRecipe, CtcRecipeOptions


def _lang():
    return Lang.build(Lexicon.from_text("YES Y\nNO N\n"))


def _corpus(rng, num_utts, words_per_utt=4):
    centers = {"Y": np.array([3.0, 0.0, 0.0]),
               "N": np.array([-3.0, 0.0, 0.0]),
               "SIL": np.array([0.0, 3.0, 0.0])}
    feats, texts = {}, {}
    for u in range(num_utts):
        words = [("YES" if rng.rand() < 0.5 else "NO")
                 for _ in range(words_per_utt)]
        seq = ["SIL"]
        for w in words:
            seq.append("Y" if w == "YES" else "N")
            seq.append("SIL")
        fr = [centers[ph] + 0.4 * rng.randn(rng.randint(6, 12), 3)
              for ph in seq]
        feats[f"u{u}"] = np.concatenate(fr).astype(np.float32)
        texts[f"u{u}"] = words
    return feats, texts


def test_hybrid_dnn_recipe(tmp_path, rng):
    lang = _lang()
    tr_f, tr_t = _corpus(rng, 16)
    te_f, te_t = _corpus(rng, 6)
    recipe = HybridRecipe(
        lang,
        HybridRecipeOptions(model_type="dnn", hidden_dim=32,
                            num_layers=1, splice_context=1,
                            learn_rate=0.2, max_iters=10,
                            minibatch_size=64, mono_iters=6,
                            mono_totgauss=40, acoustic_scale=1.0),
    )
    stats = recipe.run(tr_f, tr_t, te_f, te_t,
                       work_dir=str(tmp_path / "dnn"))
    assert stats.wer <= 10.0, stats.report()


def test_ctc_recipe(tmp_path, rng):
    lang = _lang()
    tr_f, tr_t = _corpus(rng, 20, words_per_utt=3)
    te_f, te_t = _corpus(rng, 6, words_per_utt=3)
    recipe = CtcRecipe(
        lang,
        CtcRecipeOptions(model_type="lstm", hidden_dim=32,
                         num_layers=1, learn_rate=0.1,
                         max_iters=25, num_streams=8),
    )
    stats = recipe.run(tr_f, tr_t, te_f, te_t,
                       work_dir=str(tmp_path / "ctc"))
    assert stats.wer <= 15.0, stats.report()
