"""End-to-end VAD recipe chain (reference: aslp_scripts/vad/)."""

import numpy as np

from kaldi_aslp_tpu.recipes.vad import mask_to_intervals, run


def test_mask_to_intervals():
    assert mask_to_intervals(np.array([0, 1, 1, 0, 0, 1])) == \
        [(1, 3), (5, 6)]
    assert mask_to_intervals(np.zeros(4)) == []
    assert mask_to_intervals(np.ones(4)) == [(0, 4)]


def test_vad_recipe_end_to_end(tmp_path):
    """Energy, GMM and DNN VADs all separate speech from silence on
    the synthetic corpus (run_energy_vad/run_gmm_vad/run_dnn_vad)."""
    out = run(str(tmp_path), num_train=10, num_test=4)
    assert out["energy_auc"] > 0.95
    assert out["gmm_auc"] > 0.95
    assert out["dnn_auc"] > 0.95
    assert out["num_segments"] >= 1
    assert (tmp_path / "u0.TextGrid").exists()
    assert (tmp_path / "segment.info").exists()
