"""Table (ark/scp) layer tests (reference behavior: src/util/kaldi-table.h)."""

import os

import numpy as np
import pytest

from kaldi_aslp_tpu.io import table


def test_ark_matrix_roundtrip(tmp_path):
    path = tmp_path / "feats.ark"
    mats = {
        "utt1": np.random.RandomState(0).randn(10, 13).astype(np.float32),
        "utt2": np.random.RandomState(1).randn(7, 13).astype(np.float32),
    }
    with table.matrix_writer(f"ark:{path}") as w:
        for k, v in mats.items():
            w[k] = v
    got = dict(table.sequential_matrix_reader(f"ark:{path}"))
    assert list(got) == ["utt1", "utt2"]
    for k in mats:
        np.testing.assert_array_equal(got[k], mats[k])


def test_ark_scp_and_random_access(tmp_path):
    ark, scp = tmp_path / "f.ark", tmp_path / "f.scp"
    mats = {f"u{i}": np.full((3, 2), i, np.float32) for i in range(5)}
    with table.matrix_writer(f"ark,scp:{ark},{scp}") as w:
        for k, v in mats.items():
            w[k] = v
    # scp points into the ark at byte offsets
    lines = scp.read_text().strip().splitlines()
    assert len(lines) == 5 and ":" in lines[0]
    r = table.random_access_matrix_reader(f"scp:{scp}")
    assert "u3" in r
    np.testing.assert_array_equal(r["u3"], mats["u3"])
    # sequential over scp
    got = dict(table.sequential_matrix_reader(f"scp:{scp}"))
    assert set(got) == set(mats)


def test_text_ark(tmp_path):
    path = tmp_path / "t.ark"
    m = np.array([[1.5, -2.0], [0.0, 3.0]], dtype=np.float32)
    with table.matrix_writer(f"ark,t:{path}") as w:
        w["a"] = m
    content = path.read_text()
    assert content.startswith("a  [")
    got = dict(table.sequential_matrix_reader(f"ark:{path}"))
    np.testing.assert_array_equal(got["a"], m)


def test_int_vector_ark(tmp_path):
    path = tmp_path / "ali.ark"
    ali = {"u1": np.array([1, 2, 2, 3], np.int32),
           "u2": np.array([5], np.int32)}
    with table.int_vector_writer(f"ark:{path}") as w:
        for k, v in ali.items():
            w[k] = v
    got = dict(table.sequential_int_vector_reader(f"ark:{path}"))
    for k in ali:
        np.testing.assert_array_equal(got[k], ali[k])


def test_text_int_vector_ark(tmp_path):
    path = tmp_path / "ali.txt"
    path.write_text("u1 1 2 3 4\nu2 7 8\n")
    got = dict(table.sequential_int_vector_reader(f"ark:{path}"))
    np.testing.assert_array_equal(got["u1"], [1, 2, 3, 4])
    np.testing.assert_array_equal(got["u2"], [7, 8])


def test_pipe_rspecifier(tmp_path):
    path = tmp_path / "f.ark"
    with table.matrix_writer(f"ark:{path}") as w:
        w["x"] = np.ones((2, 2), np.float32)
    got = dict(table.sequential_matrix_reader(f"ark:cat {path}|"))
    assert "x" in got


def test_posterior_ark(tmp_path):
    path = tmp_path / "post.ark"
    post = [[(0, 1.0)], [(2, 0.5), (3, 0.5)]]
    with table.posterior_writer(f"ark:{path}") as w:
        w["u"] = post
    got = dict(table.sequential_posterior_reader(f"ark:{path}"))
    assert got["u"][1][0][0] == 2


def test_posterior_ark_text(tmp_path):
    # text form "[ id p ... ]" per frame (reference: src/hmm/posterior.cc
    # WritePosterior text branch) must round-trip through the holder
    path = tmp_path / "post_t.ark"
    post = [[(0, 1.0)], [(2, 0.5), (3, 0.25)]]
    with table.posterior_writer(f"ark,t:{path}") as w:
        w["u"] = post
    got = dict(table.sequential_posterior_reader(f"ark:{path}"))
    assert len(got["u"]) == 2
    assert got["u"][1] == [(2, 0.5), (3, 0.25)]


def test_vector_ark(tmp_path):
    path = tmp_path / "v.ark"
    with table.vector_writer(f"ark:{path}") as w:
        w["s"] = np.array([1.0, 2.0], np.float32)
    got = dict(table.sequential_vector_reader(f"ark:{path}"))
    np.testing.assert_array_equal(got["s"], [1.0, 2.0])
