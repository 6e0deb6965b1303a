"""Mel filterbank matrix (reference: src/feat/mel-computations.{h,cc}).

Built once on host as a dense [num_fft_bins, num_mel_bins] matrix so the
mel projection is a single MXU matmul per batch of frames (the reference
loops over bins per frame on CPU/GPU)."""

from __future__ import annotations

import dataclasses

import numpy as np

from kaldi_aslp_tpu.utils.config import Config
from kaldi_aslp_tpu.feats.window import FrameExtractionOptions


@dataclasses.dataclass
class MelBanksOptions(Config):
    num_bins: int = 23  # reference default (mel-computations.h:43)
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0 → nyquist + high_freq
    vtln_low: float = 100.0
    vtln_high: float = -500.0


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def inverse_mel_scale(mel):
    return 700.0 * (np.exp(mel / 1127.0) - 1.0)


def vtln_warp_freq(
    vtln_low_cutoff, vtln_high_cutoff, low_freq, high_freq, warp_factor, freq
):
    """Piecewise-linear VTLN warp (reference: mel-computations.cc:240)."""
    if freq < low_freq or freq > high_freq:
        return freq
    scale = 1.0 / warp_factor
    Fl = scale * vtln_low_cutoff
    Fh = scale * min(vtln_high_cutoff if vtln_high_cutoff > 0
                     else high_freq + vtln_high_cutoff, high_freq)
    scale_left = (Fl - low_freq) / (vtln_low_cutoff - low_freq)
    scale_right = (high_freq - Fh) / (
        high_freq - min(vtln_high_cutoff if vtln_high_cutoff > 0
                        else high_freq + vtln_high_cutoff, high_freq)
    )
    if freq < vtln_low_cutoff:
        return low_freq + scale_left * (freq - low_freq)
    if freq < (vtln_high_cutoff if vtln_high_cutoff > 0
               else high_freq + vtln_high_cutoff):
        return scale * freq
    return high_freq + scale_right * (freq - high_freq)


def mel_banks_matrix(
    mel_opts: MelBanksOptions,
    frame_opts: FrameExtractionOptions,
    vtln_warp: float = 1.0,
) -> np.ndarray:
    """Return [num_fft_bins, num_bins] triangular filter matrix.

    num_fft_bins = padded_window_size/2 (the reference's MelBanks drops the
    nyquist bin; we keep that convention and the caller slices the power
    spectrum accordingly, or we pad a zero row for the nyquist bin).
    """
    num_fft_bins = frame_opts.padded_window_size // 2
    nyquist = 0.5 * frame_opts.samp_freq
    low_freq = mel_opts.low_freq
    high_freq = (mel_opts.high_freq if mel_opts.high_freq > 0
                 else nyquist + mel_opts.high_freq)
    if not (0 <= low_freq < high_freq <= nyquist):
        raise ValueError(f"bad mel frequency range [{low_freq},{high_freq}]")

    fft_bin_width = frame_opts.samp_freq / frame_opts.padded_window_size
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    num_bins = mel_opts.num_bins
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    vtln_low = mel_opts.vtln_low
    vtln_high = mel_opts.vtln_high
    if vtln_high < 0:
        vtln_high += nyquist

    bins = np.zeros((num_fft_bins, num_bins), dtype=np.float32)
    for b in range(num_bins):
        left_mel = mel_low + b * mel_delta
        center_mel = mel_low + (b + 1) * mel_delta
        right_mel = mel_low + (b + 2) * mel_delta
        if vtln_warp != 1.0:
            def warp_mel(mel):
                return mel_scale(
                    vtln_warp_freq(vtln_low, vtln_high, low_freq, high_freq,
                                   vtln_warp, inverse_mel_scale(mel))
                )
            left_mel, center_mel, right_mel = (
                warp_mel(left_mel), warp_mel(center_mel), warp_mel(right_mel)
            )
        for i in range(num_fft_bins):
            mel = mel_scale(fft_bin_width * i)
            if left_mel < mel < right_mel:
                if mel <= center_mel:
                    bins[i, b] = (mel - left_mel) / (center_mel - left_mel)
                else:
                    bins[i, b] = (right_mel - mel) / (right_mel - center_mel)
    return bins
