"""End-to-end KWS recipe chain (reference: aslp_scripts/kws/)."""

from kaldi_aslp_tpu.kws.text_fst import (
    build_keyword_filler_text_fst,
    simulation_ali,
)
from kaldi_aslp_tpu.recipes.kws import run


def test_keyword_filler_text_fst():
    txt = build_keyword_filler_text_fst({"hey": ["h", "ey"]})
    lines = txt.strip().splitlines()
    # filler core arcs from/to states 0/1/2
    assert "0 1 sil <eps>" in lines
    assert "2 2 <gbg> <eps>" in lines
    # keyword lane: entry from all three core states, olabel on the
    # last phone arc, final state
    assert "0 3 h <eps>" in lines
    assert any(l.endswith("ey hey") for l in lines)
    assert lines[-1].endswith("1.0")


def test_simulation_ali_mapping():
    clean = {"u1": [1, 1, 2], "u2": [3]}
    out = simulation_ali(clean, ["simulation_0_u1", "simulation_12_u2",
                                 "simulation_0_unknown", "plain_u1"])
    assert out == {"simulation_0_u1": [1, 1, 2],
                   "simulation_12_u2": [3]}


def test_kws_recipe_end_to_end(tmp_path):
    """Phone DNN + keyword-filler spotting separates keyword from
    non-keyword utterances (run_dnn_one_keyword.sh + simulate.sh)."""
    out = run(str(tmp_path), num_train=16, num_test=12)
    assert out["kws_auc"] > 0.9
    assert out["kws_best_acc"] > 0.85
    assert (tmp_path / "keyword.fst.txt").exists()
    assert (tmp_path / "roc.txt").exists()
