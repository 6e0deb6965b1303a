"""VAD / pitch CLI tools (reference: src/aslp-vadbin/ — apply VAD,
aslp-ali-to-sil, aslp-select-frames; src/featbin/compute-kaldi-pitch-feats)."""

from __future__ import annotations

import dataclasses

import numpy as np

from kaldi_aslp_tpu.utils.config import Config, parse_options
from kaldi_aslp_tpu.io import (
    matrix_writer,
    int_vector_writer,
    sequential_int_vector_reader,
    sequential_matrix_reader,
    read_wave,
)
from kaldi_aslp_tpu.io.datadir import read_key_value
from kaldi_aslp_tpu.vad import (
    EnergyVad,
    NnetVad,
    VadOptions,
    ali_to_sil_targets,
    select_frames,
)
from kaldi_aslp_tpu.feats.pitch import (
    PitchOptions,
    compute_pitch,
    postprocess_pitch,
)


def apply_energy_vad(argv):
    opts = VadOptions()
    args = parse_options(
        argv, [opts],
        "aslp-apply-energy-vad scp:wav.scp ark:mask.ark", 2, 2,
    )
    vad = EnergyVad(opts)
    kind, path = args[0].split(":", 1)
    with int_vector_writer(args[1]) as w:
        for utt, wav_path in read_key_value(path).items():
            wav = read_wave(wav_path)
            sr = wav.samp_freq
            win = int(sr * opts.frame_length_ms / 1000)
            n = len(wav.data[0]) // win
            frames = wav.data[0][: n * win].reshape(n, win)
            w[utt] = vad.detect(frames).astype(np.int32)
    return 0


def apply_nnet_vad(argv):
    opts = VadOptions()
    args = parse_options(
        argv, [opts],
        "aslp-apply-nnet-vad post-rspec mask-wspec", 2, 2,
    )
    vad = NnetVad(opts)
    with int_vector_writer(args[1]) as w:
        for utt, post in sequential_matrix_reader(args[0]):
            w[utt] = vad.detect_from_posteriors(
                np.asarray(post)).astype(np.int32)
    return 0


def ali_to_sil(argv):
    @dataclasses.dataclass
    class Flags(Config):
        sil_pdfs: str = "0"

    flags = Flags()
    args = parse_options(
        argv, [flags], "aslp-ali-to-sil ali-rspec targets-wspec", 2, 2
    )
    sil = [int(i) for i in flags.sil_pdfs.split(":")]
    with int_vector_writer(args[1]) as w:
        for utt, ali in sequential_int_vector_reader(args[0]):
            w[utt] = ali_to_sil_targets(ali, sil)
    return 0


def select_frames_cli(argv):
    args = parse_options(
        argv, [],
        "aslp-select-frames feats-rspec mask-rspec feats-wspec", 3, 3,
    )
    from kaldi_aslp_tpu.io import random_access_int_vector_reader

    masks = random_access_int_vector_reader(args[1])
    with matrix_writer(args[2]) as w:
        for utt, feats in sequential_matrix_reader(args[0]):
            if utt not in masks:
                continue
            m = np.asarray(masks[utt])[: len(feats)]
            w[utt] = select_frames(feats[: len(m)], m)
    return 0


def compute_pitch_cli(argv):
    popts = PitchOptions()

    @dataclasses.dataclass
    class Flags(Config):
        post_process: bool = True

    flags = Flags()
    args = parse_options(
        argv, [popts, flags],
        "compute-kaldi-pitch-feats scp:wav.scp ark:pitch.ark", 2, 2,
    )
    kind, path = args[0].split(":", 1)
    with matrix_writer(args[1]) as w:
        for utt, wav_path in read_key_value(path).items():
            wav = read_wave(wav_path)
            popts.samp_freq = wav.samp_freq
            raw = compute_pitch(wav.data[0], popts)
            w[utt] = postprocess_pitch(raw) if flags.post_process else raw
    return 0
