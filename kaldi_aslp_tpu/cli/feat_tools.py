"""Feature CLI tools (reference: src/featbin/ — compute-mfcc-feats,
compute-fbank-feats, copy-feats, apply-cmvn, add-deltas, splice-feats,
compute-cmvn-stats, feat-to-dim).

Same rspecifier/wspecifier surface so reference recipe pipe strings work
against this framework."""

from __future__ import annotations

import dataclasses
import sys

import numpy as np
import jax.numpy as jnp

from kaldi_aslp_tpu.utils.config import Config, parse_options
from kaldi_aslp_tpu.io import (
    matrix_writer,
    read_wave,
    sequential_matrix_reader,
    random_access_matrix_reader,
)
from kaldi_aslp_tpu.io.datadir import read_key_value
from kaldi_aslp_tpu.feats import (
    DeltaFeaturesOptions,
    Fbank,
    FbankOptions,
    FrameExtractionOptions,
    MelBanksOptions,
    Mfcc,
    MfccOptions,
    acc_cmvn_stats,
    add_deltas,
    apply_cmvn,
    splice_frames,
)


@dataclasses.dataclass
class _FrameFlags(Config):
    sample_frequency: float = 16000.0
    frame_length: float = 25.0
    frame_shift: float = 10.0
    dither: float = 1.0
    preemphasis_coefficient: float = 0.97
    window_type: str = "povey"
    snip_edges: bool = True
    num_mel_bins: int = 23
    low_freq: float = 20.0
    high_freq: float = 0.0


def _frame_opts(f: _FrameFlags):
    return (
        FrameExtractionOptions(
            samp_freq=f.sample_frequency, frame_length_ms=f.frame_length,
            frame_shift_ms=f.frame_shift, dither=f.dither,
            preemphasis_coefficient=f.preemphasis_coefficient,
            window_type=f.window_type, snip_edges=f.snip_edges,
        ),
        MelBanksOptions(num_bins=f.num_mel_bins, low_freq=f.low_freq,
                        high_freq=f.high_freq),
    )


def _iter_wavs(rspec: str):
    """wav rspecifier: scp of wav paths."""
    kind, path = rspec.split(":", 1)
    if kind.startswith("scp"):
        for utt, wav_path in read_key_value(path).items():
            yield utt, read_wave(wav_path)
    else:
        raise ValueError("wav input must be scp:")


def compute_mfcc_feats(argv):
    flags = _FrameFlags()

    @dataclasses.dataclass
    class MFlags(Config):
        num_ceps: int = 13
        use_energy: bool = True

    mflags = MFlags()
    args = parse_options(
        argv, [flags, mflags],
        "compute-mfcc-feats scp:wav.scp ark:feats.ark", 2, 2,
    )
    frame_opts, mel_opts = _frame_opts(flags)
    mfcc = Mfcc(frame_opts, mel_opts,
                MfccOptions(num_ceps=mflags.num_ceps,
                            use_energy=mflags.use_energy))
    with matrix_writer(args[1]) as w:
        for utt, wav in _iter_wavs(args[0]):
            w[utt] = np.asarray(mfcc(wav.data[0]))
    return 0


def compute_fbank_feats(argv):
    flags = _FrameFlags()
    args = parse_options(
        argv, [flags],
        "compute-fbank-feats scp:wav.scp ark:feats.ark", 2, 2,
    )
    frame_opts, mel_opts = _frame_opts(flags)
    fbank = Fbank(frame_opts, mel_opts, FbankOptions())
    with matrix_writer(args[1]) as w:
        for utt, wav in _iter_wavs(args[0]):
            w[utt] = np.asarray(fbank(wav.data[0]))
    return 0


def copy_feats(argv):
    args = parse_options(argv, [], "copy-feats in-rspec out-wspec", 2, 2)
    with matrix_writer(args[1]) as w:
        for utt, mat in sequential_matrix_reader(args[0]):
            w[utt] = mat
    return 0


def compute_cmvn_stats(argv):
    @dataclasses.dataclass
    class Flags(Config):
        spk2utt: str = ""

    flags = Flags()
    args = parse_options(
        argv, [flags], "compute-cmvn-stats feats-rspec stats-wspec", 2, 2
    )
    spk_of = {}
    if flags.spk2utt:
        for spk, utts in read_key_value(flags.spk2utt).items():
            for u in utts.split():
                spk_of[u] = spk
    stats = {}
    for utt, mat in sequential_matrix_reader(args[0]):
        key = spk_of.get(utt, utt)
        stats[key] = acc_cmvn_stats(mat, stats.get(key))
    with matrix_writer(args[1]) as w:
        for key in sorted(stats):
            w[key] = stats[key].astype(np.float64)
    return 0


def apply_cmvn_cli(argv):
    @dataclasses.dataclass
    class Flags(Config):
        norm_vars: bool = False
        utt2spk: str = ""

    flags = Flags()
    args = parse_options(
        argv, [flags],
        "apply-cmvn cmvn-rspec feats-rspec feats-wspec", 3, 3,
    )
    utt2spk = read_key_value(flags.utt2spk) if flags.utt2spk else {}
    cmvn = random_access_matrix_reader(args[0])
    with matrix_writer(args[2]) as w:
        for utt, mat in sequential_matrix_reader(args[1]):
            key = utt2spk.get(utt, utt)
            w[utt] = np.asarray(
                apply_cmvn(jnp.asarray(mat), cmvn[key], flags.norm_vars)
            )
    return 0


def add_deltas_cli(argv):
    @dataclasses.dataclass
    class Flags(Config):
        delta_order: int = 2
        delta_window: int = 2

    flags = Flags()
    args = parse_options(argv, [flags],
                         "add-deltas in-rspec out-wspec", 2, 2)
    opts = DeltaFeaturesOptions(order=flags.delta_order,
                                window=flags.delta_window)
    with matrix_writer(args[1]) as w:
        for utt, mat in sequential_matrix_reader(args[0]):
            w[utt] = np.asarray(add_deltas(jnp.asarray(mat), opts))
    return 0


def splice_feats(argv):
    @dataclasses.dataclass
    class Flags(Config):
        left_context: int = 4
        right_context: int = 4

    flags = Flags()
    args = parse_options(argv, [flags],
                         "splice-feats in-rspec out-wspec", 2, 2)
    with matrix_writer(args[1]) as w:
        for utt, mat in sequential_matrix_reader(args[0]):
            w[utt] = np.asarray(
                splice_frames(jnp.asarray(mat), flags.left_context,
                              flags.right_context)
            )
    return 0


def feat_to_dim(argv):
    args = parse_options(argv, [], "feat-to-dim in-rspec [out]", 1, 2)
    for _, mat in sequential_matrix_reader(args[0]):
        print(mat.shape[1])
        return 0
    return 1
