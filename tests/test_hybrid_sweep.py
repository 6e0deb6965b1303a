"""Hybrid recipe with lattice LMWT sweep (score_basic.sh path)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.recipes.hybrid import HybridRecipe, \
    HybridRecipeOptions
from tests.test_recipes import _corpus, _lang


def test_hybrid_with_lmwt_sweep(tmp_path, rng):
    lang = _lang()
    tr_f, tr_t = _corpus(rng, 14)
    te_f, te_t = _corpus(rng, 5)
    recipe = HybridRecipe(
        lang,
        HybridRecipeOptions(model_type="dnn", hidden_dim=32,
                            num_layers=1, splice_context=1,
                            learn_rate=0.2, max_iters=8,
                            minibatch_size=64, mono_iters=6,
                            mono_totgauss=40, acoustic_scale=1.0,
                            lmwt_sweep="1 2 4", lattice_beam=8.0),
    )
    stats = recipe.run(tr_f, tr_t, te_f, te_t,
                       work_dir=str(tmp_path / "sweep"))
    assert stats.wer <= 10.0, stats.report()
