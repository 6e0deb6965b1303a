"""CLI tool tests: drive the dispatcher main() like a shell would
(reference test role: the binaries ARE the reference's public surface)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from kaldi_aslp_tpu.cli.__main__ import main
from kaldi_aslp_tpu.io import (
    WaveData,
    matrix_writer,
    int_vector_writer,
    sequential_matrix_reader,
    write_wave,
)


@pytest.fixture
def wav_scp(tmp_path, rng):
    paths = {}
    for u in ("u1", "u2"):
        wav = WaveData(16000.0, (500 * rng.randn(1, 8000)).astype(
            np.float32))
        p = tmp_path / f"{u}.wav"
        write_wave(str(p), wav)
        paths[u] = str(p)
    scp = tmp_path / "wav.scp"
    scp.write_text("".join(f"{u} {p}\n" for u, p in sorted(paths.items())))
    return str(scp)


def test_feature_chain(tmp_path, wav_scp):
    feats = tmp_path / "feats.ark"
    assert main(["compute-mfcc-feats", "--dither=0",
                 f"scp:{wav_scp}", f"ark:{feats}"]) == 0
    got = dict(sequential_matrix_reader(f"ark:{feats}"))
    assert got["u1"].shape == (48, 13)

    cmvn = tmp_path / "cmvn.ark"
    assert main(["compute-cmvn-stats", f"ark:{feats}",
                 f"ark:{cmvn}"]) == 0
    normed = tmp_path / "normed.ark"
    assert main(["apply-cmvn", f"ark:{cmvn}", f"ark:{feats}",
                 f"ark:{normed}"]) == 0
    got_n = dict(sequential_matrix_reader(f"ark:{normed}"))
    np.testing.assert_allclose(got_n["u1"].mean(0), 0.0, atol=1e-3)

    deltas = tmp_path / "deltas.ark"
    assert main(["add-deltas", f"ark:{normed}", f"ark:{deltas}"]) == 0
    spliced = tmp_path / "spliced.ark"
    assert main(["splice-feats", "--left-context=2", "--right-context=2",
                 f"ark:{deltas}", f"ark:{spliced}"]) == 0
    got_s = dict(sequential_matrix_reader(f"ark:{spliced}"))
    assert got_s["u1"].shape == (48, 13 * 3 * 5)


def test_fbank_and_copy(tmp_path, wav_scp):
    feats = tmp_path / "fb.ark"
    assert main(["compute-fbank-feats", "--dither=0",
                 "--num-mel-bins=40", f"scp:{wav_scp}",
                 f"ark:{feats}"]) == 0
    got = dict(sequential_matrix_reader(f"ark:{feats}"))
    assert got["u1"].shape == (48, 40)
    out = tmp_path / "copy.ark"
    assert main(["copy-feats", f"ark:{feats}", f"ark:{out}"]) == 0


def test_nnet_tools(tmp_path, rng, capsys):
    proto = tmp_path / "nnet.proto"
    proto.write_text(
        "<AffineTransform> <InputDim> 13 <OutputDim> 20 "
        "<ParamStddev> 0.1\n"
        "<Sigmoid> <InputDim> 20 <OutputDim> 20\n"
        "<AffineTransform> <InputDim> 20 <OutputDim> 5 "
        "<ParamStddev> 0.1\n"
    )
    model = tmp_path / "model.knet"
    assert main(["aslp-nnet-init", str(proto), str(model)]) == 0
    assert main(["aslp-nnet-info", str(model)]) == 0
    out = capsys.readouterr().out
    assert "num-components 3" in out

    model2 = tmp_path / "model2.knet"
    assert main(["aslp-nnet-copy", str(model), str(model2)]) == 0
    assert main(["aslp-nnet-dot", str(model2)]) == 0
    assert "digraph" in capsys.readouterr().out

    feats = tmp_path / "f.ark"
    with matrix_writer(f"ark:{feats}") as w:
        w["u1"] = rng.randn(30, 13).astype(np.float32)
    ll = tmp_path / "ll.ark"
    assert main(["aslp-nnet-forward", str(model), f"ark:{feats}",
                 f"ark:{ll}"]) == 0
    got = dict(sequential_matrix_reader(f"ark:{ll}"))
    assert got["u1"].shape == (30, 5)
    # log-softmax output: logsumexp per row == 0
    np.testing.assert_allclose(
        np.log(np.exp(got["u1"]).sum(1)), 0.0, atol=1e-4
    )


def test_ali_tools(tmp_path, capsys):
    ali = tmp_path / "ali.ark"
    with int_vector_writer(f"ark:{ali}") as w:
        w["u1"] = np.array([1, 2, 2, 3])
        w["u2"] = np.array([3, 3])
    shifted = tmp_path / "shifted.ark"
    assert main(["aslp-ali-minus-one", f"ark:{ali}",
                 f"ark:{shifted}"]) == 0
    from kaldi_aslp_tpu.io import sequential_int_vector_reader
    got = dict(sequential_int_vector_reader(f"ark:{shifted}"))
    np.testing.assert_array_equal(got["u1"], [0, 1, 1, 2])

    counts = tmp_path / "counts.txt"
    assert main(["analyze-counts", f"ark:{ali}", str(counts)]) == 0
    c = np.loadtxt(str(counts))
    np.testing.assert_array_equal(c, [0, 1, 2, 3])

    lut = tmp_path / "lut.txt"
    np.savetxt(str(lut), np.array([0, 10, 20, 30]), fmt="%d")
    pdfs = tmp_path / "pdfs.ark"
    assert main(["ali-to-pdf", str(lut), f"ark:{ali}",
                 f"ark:{pdfs}"]) == 0
    got = dict(sequential_int_vector_reader(f"ark:{pdfs}"))
    np.testing.assert_array_equal(got["u1"], [10, 20, 20, 30])


def test_compute_wer(tmp_path, capsys):
    (tmp_path / "ref.txt").write_text("u1 YES NO YES\nu2 NO\n")
    (tmp_path / "hyp.txt").write_text("u1 YES NO NO\nu2 NO\n")
    assert main(["compute-wer", f"ark:{tmp_path}/ref.txt",
                 f"ark:{tmp_path}/hyp.txt"]) == 0
    out = capsys.readouterr().out
    assert "%WER 25.00" in out and "1 sub" in out


def test_unknown_tool(capsys):
    assert main(["bogus-tool"]) == 1
    assert main([]) == 1


def test_misc_dump_tools(tmp_path):
    """aslp-ali-to-matrix / matrix-to-txt / txt-to-matrix /
    copy-vector-from-matrix round trips (reference: src/aslp-bin)."""
    import numpy as np
    from kaldi_aslp_tpu.cli.nnet_tools import (
        ali_to_matrix, copy_vector_from_matrix, matrix_to_txt,
        txt_to_matrix)
    from kaldi_aslp_tpu.io import (int_vector_writer,
                                   sequential_matrix_reader,
                                   sequential_vector_reader)

    with int_vector_writer(f"ark:{tmp_path}/ali.ark") as w:
        w["u"] = np.array([0, 2, 1])
    assert ali_to_matrix(["--dict-size=3", f"ark:{tmp_path}/ali.ark",
                          f"ark:{tmp_path}/oh.ark"]) == 0
    oh = dict(sequential_matrix_reader(f"ark:{tmp_path}/oh.ark"))["u"]
    np.testing.assert_array_equal(
        oh, [[1, 0, 0], [0, 0, 1], [0, 1, 0]])

    assert matrix_to_txt([f"ark:{tmp_path}/oh.ark",
                          f"{tmp_path}/m.txt"]) == 0
    assert txt_to_matrix([f"{tmp_path}/m.txt",
                          f"ark:{tmp_path}/rt.ark"]) == 0
    rt = dict(sequential_matrix_reader(f"ark:{tmp_path}/rt.ark"))["u"]
    np.testing.assert_array_equal(rt, oh)

    assert copy_vector_from_matrix(
        ["--column=1", f"ark:{tmp_path}/oh.ark",
         f"ark:{tmp_path}/v.ark"]) == 0
    v = dict(sequential_vector_reader(f"ark:{tmp_path}/v.ark"))["u"]
    np.testing.assert_array_equal(v, [0, 0, 1])
