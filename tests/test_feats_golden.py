"""Golden feature parity vs the reference's HTK fixtures (reference:
src/feat/feature-mfcc-test.cc UnitTestHTKCompare1-6,
feature-fbank-test.cc UnitTestHTKCompare1-4, feature-plp-test.cc
UnitTestHTKCompare1, fixtures in src/feat/test_data/).

Configurations and tolerances mirror the reference tests exactly; rows
10..N-10 are compared (the reference skips the edges because delta
handling differs from HTK there).  These tests fail on any windowing /
mel / lifter / DCT misreading — the per-frame numpy mirrors in
test_feats.py cannot catch a shared misreading, these can."""

import os

import numpy as np
import pytest

from kaldi_aslp_tpu.io.wave import read_wave
from kaldi_aslp_tpu.io.htk import read_htk, write_htk
from kaldi_aslp_tpu.feats.mfcc import Mfcc, MfccOptions
from kaldi_aslp_tpu.feats.fbank import Fbank, FbankOptions
from kaldi_aslp_tpu.feats.plp import Plp, PlpOptions
from kaldi_aslp_tpu.feats.window import FrameExtractionOptions
from kaldi_aslp_tpu.feats.mel import MelBanksOptions
from kaldi_aslp_tpu.feats.functions import add_deltas, DeltaFeaturesOptions
from kaldi_aslp_tpu.feats.kaldi_rand import GlibcRandom, kaldi_dither

TEST_DATA = "/root/reference/src/feat/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TEST_DATA), reason="reference fixtures not present"
)


def _waveform():
    wav = read_wave(os.path.join(TEST_DATA, "test.wav"))
    assert wav.data.shape[0] == 1
    assert wav.samp_freq == 16000.0
    return wav.data[0]


def _frame_opts(**kw):
    base = dict(dither=0.0, preemphasis_coefficient=0.0,
                window_type="hamming", remove_dc_offset=False,
                round_to_power_of_two=True)
    base.update(kw)
    return FrameExtractionOptions(**base)


def _assert_golden(feats, htk_name, tol):
    htk, _ = read_htk(os.path.join(TEST_DATA, htk_name))
    feats = np.asarray(feats)
    assert feats.shape == htk.shape, (feats.shape, htk.shape)
    diff = np.abs(feats[10:-10] - htk[10:-10])
    assert diff.max() <= tol, f"{htk_name}: max diff {diff.max()} > {tol}"


def _deltas(x):
    return np.asarray(add_deltas(np.asarray(x), DeltaFeaturesOptions()))


# ---- MFCC vs HTK (reference: feature-mfcc-test.cc, tolerance 1.0) ----

MFCC_CASES = [
    # (fixture, frame kwargs, mel opts, mfcc opts, vtln_warp)
    ("test.wav.fea_htk.1", {}, dict(low_freq=0.0, htk_mode=True),
     dict(use_energy=False), 1.0),
    ("test.wav.fea_htk.2", {}, dict(low_freq=0.0, htk_mode=True),
     dict(use_energy=True), 1.0),
    ("test.wav.fea_htk.3", {}, dict(low_freq=20.0, htk_mode=True),
     dict(use_energy=True), 1.0),
    ("test.wav.fea_htk.4", dict(preemphasis_coefficient=0.97),
     dict(low_freq=0.0, htk_mode=True), dict(use_energy=True), 1.0),
    ("test.wav.fea_htk.5", dict(preemphasis_coefficient=0.97),
     dict(low_freq=0.0, htk_mode=True, vtln_low=100.0, vtln_high=7500.0),
     dict(use_energy=True), 1.1),
    ("test.wav.fea_htk.6", dict(preemphasis_coefficient=0.97),
     dict(num_bins=24, low_freq=125.0, high_freq=7800.0),
     dict(use_energy=False), 1.0),
]


@pytest.mark.parametrize("fixture,fkw,melkw,mkw,warp", MFCC_CASES)
def test_mfcc_htk_golden(fixture, fkw, melkw, mkw, warp):
    mfcc = Mfcc(_frame_opts(**fkw), MelBanksOptions(**melkw),
                MfccOptions(htk_compat=True, **mkw), vtln_warp=warp)
    _assert_golden(_deltas(mfcc(_waveform())), fixture, 1.0)


# ---- FBANK vs HTK (reference: feature-fbank-test.cc) ----

FBANK_CASES = [
    ("test.wav.fbank_htk.1", dict(low_freq=0.0), 1.0, 0.001),
    ("test.wav.fbank_htk.2", dict(low_freq=25.0), 1.0, 0.001),
    # warp < 1: Kaldi's VTLN deliberately differs from HTK's (reference
    # comment feature-mfcc-test.cc:479-480); the Kaldi-vs-Kaldi parity
    # is covered by test_mel_matrix_matches_reference_algorithm below
    ("test.wav.fbank_htk.3",
     dict(low_freq=25.0, vtln_low=100.0, vtln_high=7500.0), 0.9, 0.5),
    ("test.wav.fbank_htk.4",
     dict(low_freq=25.0, vtln_low=100.0, vtln_high=7500.0), 1.1, 0.01),
]


@pytest.mark.parametrize("fixture,melkw,warp,tol", FBANK_CASES)
def test_fbank_htk_golden(fixture, melkw, warp, tol):
    fbank = Fbank(_frame_opts(), MelBanksOptions(htk_mode=True, **melkw),
                  FbankOptions(htk_compat=True, use_energy=False),
                  vtln_warp=warp)
    _assert_golden(fbank(_waveform()), fixture, tol)


# ---- PLP vs HTK (reference: feature-plp-test.cc, tolerance 0.10) ----

def test_plp_htk_golden():
    plp = Plp(_frame_opts(), MelBanksOptions(low_freq=0.0),
              PlpOptions(htk_compat=True, use_energy=False,
                         cepstral_scale=1.0))
    _assert_golden(_deltas(plp(_waveform())), "test.wav.plp_htk.1", 0.10)


# ---- mel matrix parity against a literal transcription ----

def test_mel_matrix_matches_reference_algorithm():
    """Independent literal transcription of MelBanks::MelBanks
    (mel-computations.cc:60-140) including VTLN warp at factor 0.9 must
    equal our vectorized construction bit-for-bit."""
    from kaldi_aslp_tpu.feats.mel import (inverse_mel_scale,
                                          mel_banks_matrix, mel_scale,
                                          vtln_warp_freq)

    fo = FrameExtractionOptions()
    mo = MelBanksOptions(low_freq=25.0, htk_mode=True, vtln_low=100.0,
                         vtln_high=7500.0)
    for warp in (0.9, 1.0, 1.1):
        mine = mel_banks_matrix(mo, fo, warp)
        nyq = 8000.0
        fft_bins, fftw = 256, 16000.0 / 512
        ml, mh = mel_scale(25.0), mel_scale(nyq)
        d = (mh - ml) / 24
        ref = np.zeros((fft_bins, 23), np.float32)
        for b in range(23):
            edges = [ml + b * d, ml + (b + 1) * d, ml + (b + 2) * d]
            if warp != 1.0:
                edges = [mel_scale(vtln_warp_freq(
                    100.0, 7500.0, 25.0, nyq, warp, inverse_mel_scale(m)))
                    for m in edges]
            lm, cm, rm = edges
            first = -1
            for i in range(fft_bins):
                mel = mel_scale(fftw * i)
                if lm < mel < rm:
                    ref[i, b] = ((mel - lm) / (cm - lm) if mel <= cm
                                 else (rm - mel) / (rm - cm))
                    if first == -1:
                        first = i
            if b == 0 and first >= 0:
                ref[first, 0] = 0.0  # htk_mode bug replication
        np.testing.assert_array_equal(mine, ref, err_msg=f"warp {warp}")


# ---- HTK file I/O round trip ----

def test_htk_io_roundtrip(tmp_path):
    feats = np.random.RandomState(0).randn(17, 13).astype(np.float32)
    path = tmp_path / "f.htk"
    write_htk(str(path), feats, sample_kind=6)
    got, hdr = read_htk(str(path))
    np.testing.assert_array_equal(got, feats)
    assert hdr.num_samples == 17 and hdr.sample_size == 52
    assert hdr.sample_kind == 6


# ---- Kaldi dither RNG parity (validated against real glibc) ----

def test_glibc_random_replica():
    """Replica of glibc rand() must match the host libc bit-for-bit
    (probe compiled on the fly; skipped when no compiler)."""
    import shutil
    import subprocess
    import tempfile

    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        pytest.skip("no C compiler")
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "p.c")
        with open(src, "w") as f:
            f.write(
                "#include <stdio.h>\n#include <stdlib.h>\n"
                "int main(int c, char** v){srand(atoi(v[1]));"
                "for(int i=0;i<32;i++)printf(\"%d\\n\",rand());return 0;}\n")
        exe = os.path.join(d, "p")
        subprocess.run([cc, "-o", exe, src], check=True)
        for seed in (0, 1, 777, 123456789):
            out = subprocess.run([exe, str(seed)], capture_output=True,
                                 text=True, check=True)
            want = [int(x) for x in out.stdout.split()]
            g = GlibcRandom(seed)
            got = [g.rand() for _ in range(32)]
            assert got == want, f"seed {seed}"


def test_kaldi_dither_shape_and_determinism():
    frames = np.zeros((3, 5), np.float32)
    a = kaldi_dither(frames, 1.0, GlibcRandom(777))
    b = kaldi_dither(frames, 1.0, GlibcRandom(777))
    np.testing.assert_array_equal(a, b)
    assert a.std() > 0.5  # actually dithered
    # row-major order: first value of frame 0 == first RandGauss draw
    g = GlibcRandom(777)
    assert a[0, 0] == g.rand_gauss()
