"""Config / datadir / wave tests (reference: src/util/parse-options.h,
utils/ data-dir conventions, src/feat/wave-reader.h)."""

import dataclasses
import io

import numpy as np
import pytest

from kaldi_aslp_tpu.utils.config import Config, ConfigError, parse_options
from kaldi_aslp_tpu.io.wave import WaveData, read_wave, write_wave
from kaldi_aslp_tpu.io.datadir import DataDir, split_data_dir


@dataclasses.dataclass
class TrainOpts(Config):
    learn_rate: float = 0.008
    momentum: float = 0.0
    minibatch_size: int = 256
    use_gpu: str = "yes"
    apply_log: bool = False


def test_parse_options_basic():
    opts = TrainOpts()
    args = parse_options(
        ["--learn-rate=0.001", "--apply-log=true", "model.in", "model.out"],
        [opts],
    )
    assert opts.learn_rate == 0.001
    assert opts.apply_log is True
    assert args == ["model.in", "model.out"]


def test_parse_options_unknown_flag():
    with pytest.raises(ConfigError):
        parse_options(["--bogus=1"], [TrainOpts()])


def test_parse_options_config_file(tmp_path):
    cfg = tmp_path / "train.conf"
    cfg.write_text("--momentum=0.9\n# comment\n--minibatch-size=512\n")
    opts = TrainOpts()
    parse_options([f"--config={cfg}"], [opts])
    assert opts.momentum == 0.9
    assert opts.minibatch_size == 512


def test_wave_roundtrip(tmp_path):
    t = np.arange(1600, dtype=np.float32)
    samples = (1000 * np.sin(2 * np.pi * 440 * t / 8000)).reshape(1, -1)
    wav = WaveData(samp_freq=8000.0, data=samples)
    path = tmp_path / "a.wav"
    write_wave(str(path), wav)
    back = read_wave(str(path))
    assert back.samp_freq == 8000.0
    assert back.data.shape == (1, 1600)
    np.testing.assert_allclose(back.data, np.round(samples), atol=1.0)
    assert abs(back.duration - 0.2) < 1e-9


def test_datadir_roundtrip(tmp_path):
    d = DataDir(path=str(tmp_path / "data"))
    d.wav_scp = {"u1": "/x/u1.wav", "u2": "/x/u2.wav"}
    d.text = {"u1": "YES NO", "u2": "NO"}
    d.utt2spk = {"u1": "s1", "u2": "s2"}
    d.save()
    back = DataDir.load(d.path)
    assert back.text["u1"] == "YES NO"
    assert back.spk2utt() == {"s1": ["u1"], "s2": ["u2"]}
    assert back.validate() == []


def test_split_data_dir(tmp_path):
    d = DataDir(path=str(tmp_path))
    d.wav_scp = {f"u{i}": f"/w/{i}.wav" for i in range(10)}
    d.utt2spk = {f"u{i}": "s" for i in range(10)}
    shards = split_data_dir(d, 3)
    total = sum(len(s.wav_scp) for s in shards)
    assert total == 10
    assert all(len(s.wav_scp) >= 3 for s in shards)
