"""Byte-level tests of the Kaldi serialization layer.

Golden byte strings are hand-assembled from the format definitions
(reference: src/base/io-funcs.h, src/matrix/kaldi-matrix.cc), so
round-trip AND absolute format compatibility are both checked."""

import io
import struct

import numpy as np
import pytest

from kaldi_aslp_tpu.io import kaldi_io


def test_matrix_golden_bytes():
    # "FM " + \4 rows + \4 cols + row-major f32: the exact layout the
    # reference's Matrix::Write(binary) produces.
    mat = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    buf = io.BytesIO()
    kaldi_io.write_matrix(buf, mat)
    expected = (
        b"FM \x04" + struct.pack("<i", 2) + b"\x04" + struct.pack("<i", 2)
        + struct.pack("<4f", 1.0, 2.0, 3.0, 4.0)
    )
    assert buf.getvalue() == expected
    buf.seek(0)
    out = kaldi_io.read_matrix(buf)
    np.testing.assert_array_equal(out, mat)


def test_matrix_double_roundtrip():
    mat = np.random.RandomState(0).randn(5, 13).astype(np.float64)
    buf = io.BytesIO()
    kaldi_io.write_matrix(buf, mat)
    buf.seek(0)
    out = kaldi_io.read_matrix(buf)
    np.testing.assert_allclose(out, mat.astype(np.float32), rtol=1e-6)


def test_vector_roundtrip():
    vec = np.array([0.5, -1.5, 3.25], dtype=np.float32)
    buf = io.BytesIO()
    kaldi_io.write_vector(buf, vec)
    assert buf.getvalue().startswith(b"FV \x04")
    buf.seek(0)
    np.testing.assert_array_equal(kaldi_io.read_vector(buf), vec)


def test_int_vector_golden_bytes():
    vec = np.array([3, 1, 4, 1, 5], dtype=np.int32)
    buf = io.BytesIO()
    kaldi_io.write_int_vector(buf, vec)
    expected = b"\x04" + struct.pack("<i", 5) + struct.pack("<5i", 3, 1, 4, 1, 5)
    assert buf.getvalue() == expected
    buf.seek(0)
    np.testing.assert_array_equal(kaldi_io.read_int_vector(buf), vec)


def test_posterior_roundtrip():
    post = [[(3, 1.0)], [(5, 0.25), (7, 0.75)], []]
    buf = io.BytesIO()
    kaldi_io.write_posterior(buf, post)
    buf.seek(0)
    out = kaldi_io.read_posterior(buf)
    assert len(out) == 3
    assert out[0] == [(3, 1.0)]
    assert out[1][0][0] == 5 and abs(out[1][1][1] - 0.75) < 1e-7
    assert out[2] == []


def test_compressed_matrix_cm2():
    # CM2: uint16 quantization of the full range, row-major
    # (reference: compressed-matrix.cc format 2)
    rows, cols = 3, 4
    rs = np.random.RandomState(1)
    mat = rs.randn(rows, cols).astype(np.float32)
    min_v, max_v = float(mat.min()), float(mat.max())
    rng = max_v - min_v
    q = np.round((mat - min_v) / rng * 65535).astype("<u2")
    buf = io.BytesIO()
    buf.write(b"CM2 ")
    buf.write(struct.pack("<ffii", min_v, rng, rows, cols))
    buf.write(q.tobytes())
    buf.seek(0)
    out = kaldi_io.read_matrix(buf)
    np.testing.assert_allclose(out, mat, atol=rng / 65535 + 1e-6)


def test_compressed_matrix_cm3():
    rows, cols = 2, 5
    rs = np.random.RandomState(2)
    mat = rs.rand(rows, cols).astype(np.float32) * 10
    min_v, max_v = float(mat.min()), float(mat.max())
    rng = max_v - min_v
    q = np.round((mat - min_v) / rng * 255).astype(np.uint8)
    buf = io.BytesIO()
    buf.write(b"CM3 ")
    buf.write(struct.pack("<ffii", min_v, rng, rows, cols))
    buf.write(q.tobytes())
    buf.seek(0)
    out = kaldi_io.read_matrix(buf)
    np.testing.assert_allclose(out, mat, atol=rng / 255 + 1e-5)


def test_compressed_matrix_cm1():
    # CM1: per-column percentile headers + 3-segment uint8 code
    rows, cols = 8, 2
    min_v, rng = -1.0, 2.0

    def f_to_u16(v):
        return int(np.clip((v - min_v) / rng * 65535, 0, 65535))

    # column percentiles chosen by hand: p0=-1, p25=-0.5, p75=0.5, p100=1
    header = struct.pack(
        "<4H", f_to_u16(-1.0), f_to_u16(-0.5), f_to_u16(0.5), f_to_u16(1.0)
    ) * cols
    # char 0 → p0; char 64 → p25; char 192 → p75; char 255 → p100
    codes = np.tile(np.array([0, 64, 128, 192, 255, 32, 96, 224],
                             dtype=np.uint8), (cols, 1))
    buf = io.BytesIO()
    buf.write(b"CM ")
    buf.write(struct.pack("<ffii", min_v, rng, rows, cols))
    buf.write(header)
    buf.write(codes.tobytes())
    buf.seek(0)
    out = kaldi_io.read_matrix(buf)
    assert out.shape == (rows, cols)
    # segment endpoints decode exactly (up to u16 quantization of headers)
    np.testing.assert_allclose(out[0], [-1.0, -1.0], atol=2e-4)
    np.testing.assert_allclose(out[1], [-0.5, -0.5], atol=2e-4)
    np.testing.assert_allclose(out[3], [0.5, 0.5], atol=2e-4)
    np.testing.assert_allclose(out[4], [1.0, 1.0], atol=2e-4)
    # midpoint of middle segment: p25 + (p75-p25)*(128-64)/128 = 0.0
    np.testing.assert_allclose(out[2], [0.0, 0.0], atol=2e-4)


def test_text_matrix_parse():
    text = "[\n 1 2 3\n 4 5 6 ]"
    out = kaldi_io.read_text_matrix_lines(text)
    np.testing.assert_array_equal(
        out, np.array([[1, 2, 3], [4, 5, 6]], dtype=np.float32)
    )
