"""VAD / pitch CLI tests + dropout-rng regression."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kaldi_aslp_tpu.cli.__main__ import main
from kaldi_aslp_tpu.io import (
    WaveData,
    int_vector_writer,
    matrix_writer,
    sequential_int_vector_reader,
    sequential_matrix_reader,
    write_wave,
)
from kaldi_aslp_tpu.models import Nnet


@pytest.fixture
def speech_wav_scp(tmp_path, rng):
    sr = 16000
    quiet = (2 * rng.randn(sr // 2)).astype(np.float32)
    t = np.arange(sr // 2) / sr
    loud = (5000 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    wave = np.concatenate([quiet, loud, quiet])
    p = tmp_path / "u.wav"
    write_wave(str(p), WaveData(float(sr), wave[None, :]))
    scp = tmp_path / "wav.scp"
    scp.write_text(f"u {p}\n")
    return str(scp)


def test_energy_vad_cli(tmp_path, speech_wav_scp):
    mask_ark = tmp_path / "mask.ark"
    assert main(["aslp-apply-energy-vad", "--energy-threshold=12",
                 f"scp:{speech_wav_scp}", f"ark:{mask_ark}"]) == 0
    got = dict(sequential_int_vector_reader(f"ark:{mask_ark}"))
    m = got["u"]
    assert m.sum() > 10 and m.sum() < len(m)  # some speech, some silence


def test_select_frames_and_ali_to_sil(tmp_path, rng):
    feats_ark = tmp_path / "f.ark"
    mask_ark = tmp_path / "m.ark"
    with matrix_writer(f"ark:{feats_ark}") as w:
        w["u"] = rng.randn(10, 3).astype(np.float32)
    with int_vector_writer(f"ark:{mask_ark}") as w:
        w["u"] = np.array([1, 1, 0, 0, 1, 1, 1, 0, 0, 0], np.int32)
    out_ark = tmp_path / "sel.ark"
    assert main(["aslp-select-frames", f"ark:{feats_ark}",
                 f"ark:{mask_ark}", f"ark:{out_ark}"]) == 0
    got = dict(sequential_matrix_reader(f"ark:{out_ark}"))
    assert got["u"].shape == (5, 3)

    ali_ark = tmp_path / "ali.ark"
    with int_vector_writer(f"ark:{ali_ark}") as w:
        w["u"] = np.array([0, 3, 3, 0], np.int32)
    sil_ark = tmp_path / "sil.ark"
    assert main(["aslp-ali-to-sil", "--sil-pdfs=0",
                 f"ark:{ali_ark}", f"ark:{sil_ark}"]) == 0
    got = dict(sequential_int_vector_reader(f"ark:{sil_ark}"))
    np.testing.assert_array_equal(got["u"], [0, 1, 1, 0])


def test_pitch_cli(tmp_path, speech_wav_scp):
    out = tmp_path / "pitch.ark"
    assert main(["compute-kaldi-pitch-feats",
                 f"scp:{speech_wav_scp}", f"ark:{out}"]) == 0
    got = dict(sequential_matrix_reader(f"ark:{out}"))
    assert got["u"].shape[1] == 3  # pov, norm log-pitch, delta


def test_dropout_active_in_training(rng):
    """Regression: trainers must pass rng so Dropout actually drops."""
    net = Nnet.from_proto(
        "<AffineTransform> <InputDim> 4 <OutputDim> 32 <ParamStddev> 0.5\n"
        "<Dropout> <InputDim> 32 <OutputDim> 32 "
        "<DropoutRetention> 0.5\n"
        "<AffineTransform> <InputDim> 32 <OutputDim> 2 <ParamStddev> 0.5"
    )
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    y1, _ = net.apply(params, x, train=True, rng=jax.random.PRNGKey(1))
    y2, _ = net.apply(params, x, train=True, rng=jax.random.PRNGKey(2))
    y3, _ = net.apply(params, x, train=False)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))  # stochastic
    y3b, _ = net.apply(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(y3), np.asarray(y3b))

    # the trainer path feeds an rng (different steps → different drops)
    from kaldi_aslp_tpu.train import FrameTrainer, NnetTrainOptions, \
        init_velocity
    trainer = FrameTrainer(net, NnetTrainOptions())
    velocity = init_velocity(params)
    t = jnp.asarray(rng.randint(0, 2, 8))
    batches = [(np.asarray(x), np.asarray(t))]
    p1, v1, rep = trainer.train_epoch(params, velocity, batches, 0.1)
    assert np.isfinite(rep.avg_loss)


def test_eval_vad_cli(tmp_path, capsys):
    from kaldi_aslp_tpu.cli.vad_tools import eval_vad_cli
    from kaldi_aslp_tpu.io import int_vector_writer, matrix_writer
    import numpy as np

    with int_vector_writer(f"ark:{tmp_path}/hyp.ark") as w:
        w["u1"] = np.array([1, 1, 0, 0, 1])
    with int_vector_writer(f"ark:{tmp_path}/ref.ark") as w:
        w["u1"] = np.array([1, 1, 1, 0, 1])
    with matrix_writer(f"ark:{tmp_path}/sc.ark") as w:
        w["u1"] = np.array([[0.9], [0.8], [0.6], [0.1], [0.7]],
                           np.float32)
    rc = eval_vad_cli([f"ark:{tmp_path}/hyp.ark",
                       f"ark:{tmp_path}/ref.ark",
                       f"ark:{tmp_path}/sc.ark"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "accuracy 0.8000" in out
    assert "AUC" in out and "EER" in out


def test_apply_nn_vad_segment_cli(tmp_path):
    from kaldi_aslp_tpu.cli.vad_tools import apply_nnet_vad_segment
    from kaldi_aslp_tpu.io import matrix_writer
    import numpy as np

    # sil posterior in column 0: frames 2-4 are speech
    post = np.array([[0.9, 0.1]] * 2 + [[0.1, 0.9]] * 3 +
                    [[0.9, 0.1]] * 2, np.float32)
    with matrix_writer(f"ark:{tmp_path}/post.ark") as w:
        w["u1"] = post
    rc = apply_nnet_vad_segment(
        ["--speech-trigger-ms=10", "--silence-trigger-ms=10",
         "--lookback-ms=0",
         f"ark:{tmp_path}/post.ark", f"{tmp_path}/segments.txt"])
    assert rc == 0
    lines = (tmp_path / "segments.txt").read_text().split()
    assert lines[0] == "u1"


def test_nnet_insert_cli(tmp_path):
    from kaldi_aslp_tpu.cli.nnet_tools import nnet_init, nnet_insert
    from kaldi_aslp_tpu.models import Nnet

    proto_a = tmp_path / "a.proto"
    proto_a.write_text("<NnetProto>\n"
                       "<AffineTransform> <InputDim> 4 <OutputDim> 6\n"
                       "<Softmax> <InputDim> 6 <OutputDim> 6\n"
                       "</NnetProto>\n")
    proto_b = tmp_path / "b.proto"
    proto_b.write_text("<NnetProto>\n"
                       "<Splice> <InputDim> 4 <OutputDim> 4\n"
                       "</NnetProto>\n")
    assert nnet_init([str(proto_a), f"{tmp_path}/a.knet"]) == 0
    assert nnet_init([str(proto_b), f"{tmp_path}/b.knet"]) == 0
    assert nnet_insert(["--position=0", f"{tmp_path}/a.knet",
                        f"{tmp_path}/b.knet",
                        f"{tmp_path}/out.knet"]) == 0
    net, params, _ = Nnet.load(f"{tmp_path}/out.knet")
    assert net.num_components() == 3
    assert net.nodes[0].comp.token == "<Splice>"
