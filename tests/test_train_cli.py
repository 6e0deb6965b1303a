"""Trainer CLI tests: the binaries' surface end-to-end (reference:
aslp-nnet-train-simple / -ctc-streams / -lstm-streams mains)."""

import numpy as np
import pytest
import jax

from kaldi_aslp_tpu.cli.__main__ import main
from kaldi_aslp_tpu.io import int_vector_writer, matrix_writer
from kaldi_aslp_tpu.models import Nnet
from kaldi_aslp_tpu.feats.plp import Plp, Spectrogram
from kaldi_aslp_tpu.feats import FrameExtractionOptions


@pytest.fixture
def frame_data(tmp_path, rng):
    """Separable frame task written as ark files."""
    w = rng.randn(6, 4)
    feats_path = tmp_path / "feats.ark"
    tgt_path = tmp_path / "targets.ark"
    with matrix_writer(f"ark:{feats_path}") as fw, \
            int_vector_writer(f"ark:{tgt_path}") as tw:
        for u in range(6):
            x = rng.randn(80, 6).astype(np.float32)
            y = (x @ w).argmax(1).astype(np.int32)
            fw[f"u{u}"] = x
            tw[f"u{u}"] = y
    return str(feats_path), str(tgt_path)


def _make_model(tmp_path, proto):
    p = tmp_path / "nnet.proto"
    p.write_text(proto)
    model = tmp_path / "model.knet"
    assert main(["aslp-nnet-init", str(p), str(model)]) == 0
    return str(model)


def test_train_simple_cli(tmp_path, frame_data, capsys):
    feats, targets = frame_data
    model = _make_model(
        tmp_path,
        "<AffineTransform> <InputDim> 6 <OutputDim> 16 <ParamStddev> 0.1\n"
        "<Sigmoid> <InputDim> 16 <OutputDim> 16\n"
        "<AffineTransform> <InputDim> 16 <OutputDim> 4 <ParamStddev> 0.1\n"
    )
    out_model = str(tmp_path / "model_it1.knet")
    # CV before
    assert main(["aslp-nnet-train-simple", "--cross-validate=true",
                 f"ark:{feats}", f"ark:{targets}", model]) == 0
    cv0 = capsys.readouterr().out
    loss0 = float(cv0.split("AvgLoss: ")[1].split()[0])
    # several epochs
    cur = model
    for i in range(5):
        assert main(["aslp-nnet-train-simple", "--learn-rate=0.5",
                     "--momentum=0.9", "--minibatch-size=64",
                     f"ark:{feats}", f"ark:{targets}",
                     cur, out_model]) == 0
        cur = out_model
        capsys.readouterr()
    assert main(["aslp-nnet-train-simple", "--cross-validate=true",
                 f"ark:{feats}", f"ark:{targets}", out_model]) == 0
    cv1 = capsys.readouterr().out
    loss1 = float(cv1.split("AvgLoss: ")[1].split()[0])
    assert loss1 < loss0 * 0.8, (loss0, loss1)
    assert "FRAME_ACCURACY" in cv1


def test_train_lstm_streams_cli(tmp_path, frame_data, capsys):
    feats, targets = frame_data
    model = _make_model(
        tmp_path,
        "<Lstm> <InputDim> 6 <OutputDim> 12\n"
        "<AffineTransform> <InputDim> 12 <OutputDim> 4 <ParamStddev> 0.1\n"
    )
    out_model = str(tmp_path / "m2.knet")
    assert main(["aslp-nnet-train-lstm-streams", "--learn-rate=0.2",
                 "--num-streams=3", "--batch-size=16",
                 "--targets-delay=0",
                 f"ark:{feats}", f"ark:{targets}", model,
                 out_model]) == 0
    out = capsys.readouterr().out
    assert "AvgLoss:" in out


def test_train_ctc_streams_cli(tmp_path, rng, capsys):
    feats_path = tmp_path / "f.ark"
    lab_path = tmp_path / "l.ark"
    with matrix_writer(f"ark:{feats_path}") as fw, \
            int_vector_writer(f"ark:{lab_path}") as lw:
        for u in range(5):
            T = 30 + u
            fw[f"u{u}"] = rng.randn(T, 5).astype(np.float32)
            lw[f"u{u}"] = rng.randint(1, 7, 4).astype(np.int32)
    model = _make_model(
        tmp_path,
        "<Lstm> <InputDim> 5 <OutputDim> 10\n"
        "<AffineTransform> <InputDim> 10 <OutputDim> 7 <ParamStddev> 0.1\n"
    )
    out_model = str(tmp_path / "m3.knet")
    assert main(["aslp-nnet-train-ctc-streams", "--learn-rate=0.05",
                 "--num-streams=3", f"ark:{feats_path}",
                 f"ark:{lab_path}", model, out_model]) == 0
    out = capsys.readouterr().out
    assert "AvgLoss:" in out


def test_spectrogram_and_plp(rng):
    wave = (1000 * rng.randn(8000)).astype(np.float32)
    opts = FrameExtractionOptions(samp_freq=8000.0, dither=0.0)
    spec = Spectrogram(opts)
    s = np.asarray(spec(wave))
    assert s.shape == (98, 129)  # 256-point fft → 129 bins
    plp = Plp(opts)
    p = plp(wave)
    assert p.shape == (98, 13)
    assert np.isfinite(p).all()
    # energy in c0 (use_energy default)
    assert p[:, 0].std() >= 0.0
