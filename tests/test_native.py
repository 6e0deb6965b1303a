"""Native ark scanner tests: parity with the Python reader + speed
sanity (reference role: src/util/ C++ Table I/O)."""

import time

import numpy as np
import pytest

from kaldi_aslp_tpu.io import matrix_writer, int_vector_writer, \
    vector_writer, sequential_matrix_reader
from kaldi_aslp_tpu.native import FastArkReader, get_lib


def test_native_lib_builds():
    assert get_lib() is not None, "C++ toolchain should be available"


def test_fast_ark_matches_python(tmp_path, rng):
    path = tmp_path / "f.ark"
    mats = {f"utt{i}": rng.randn(50 + i, 40).astype(np.float32)
            for i in range(20)}
    with matrix_writer(f"ark:{path}") as w:
        for k, v in mats.items():
            w[k] = v
    fast = FastArkReader(str(path))
    assert set(fast.keys()) == set(mats)
    for k, v in mats.items():
        np.testing.assert_array_equal(fast[k], v)


def test_fast_ark_int_vectors(tmp_path):
    path = tmp_path / "ali.ark"
    with int_vector_writer(f"ark:{path}") as w:
        w["u1"] = np.array([1, 2, 3], np.int32)
        w["u2"] = np.array([9], np.int32)
    fast = FastArkReader(str(path))
    np.testing.assert_array_equal(fast["u1"], [1, 2, 3])
    np.testing.assert_array_equal(fast["u2"], [9])


def test_fast_ark_vectors(tmp_path):
    path = tmp_path / "v.ark"
    with vector_writer(f"ark:{path}") as w:
        w["s"] = np.array([1.5, -2.5], np.float32)
    fast = FastArkReader(str(path))
    np.testing.assert_array_equal(fast["s"], [1.5, -2.5])


def test_gather_rows(tmp_path, rng):
    path = tmp_path / "g.ark"
    mat = rng.randn(100, 13).astype(np.float32)
    with matrix_writer(f"ark:{path}") as w:
        w["u"] = mat
    fast = FastArkReader(str(path))
    idx = np.array([5, 0, 99, 17])
    got = fast.gather_rows("u", idx)
    np.testing.assert_array_equal(got, mat[idx])


def test_fast_ark_speedup_many_entries(tmp_path, rng):
    """Per-entry overhead: on arks with thousands of small entries
    (alignments) the native scan must clearly beat the Python reader."""
    from kaldi_aslp_tpu.io import sequential_int_vector_reader

    path = tmp_path / "ali.ark"
    with int_vector_writer(f"ark:{path}") as w:
        for i in range(5000):
            w[f"u{i}"] = rng.randint(1, 100, 50).astype(np.int32)
    # warm the page cache
    open(path, "rb").read()

    def time_native():
        t0 = time.perf_counter()
        fast = FastArkReader(str(path))
        total = sum(int(fast[k][0]) for k in fast.keys())
        return time.perf_counter() - t0, total

    def time_python():
        t0 = time.perf_counter()
        total = sum(
            int(v[0]) for _, v in
            sequential_int_vector_reader(f"ark:{path}")
        )
        return time.perf_counter() - t0, total

    # best-of-3 to survive CI load spikes (typical ratio 3-10x)
    t_native, total_native = min(time_native() for _ in range(3))
    t_python, total_py = min(time_python() for _ in range(3))
    assert total_native == total_py
    assert t_native < t_python, (t_native, t_python)
