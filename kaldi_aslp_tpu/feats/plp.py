"""Spectrogram and PLP features (reference: src/feat/feature-spectrogram.
{h,cc}, feature-plp.{h,cc} — mel/bark filterbank, equal-loudness
preemphasis, intensity-to-loudness compression, autocorrelation → LPC via
Levinson-Durbin, cepstral recursion)."""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from kaldi_aslp_tpu.utils.config import Config
from kaldi_aslp_tpu.feats.window import (
    FrameExtractionOptions,
    compute_power_spectrum,
    extract_frames,
    num_frames,
    process_window,
    window_function,
)
from kaldi_aslp_tpu.feats.mel import MelBanksOptions, mel_banks_matrix
from kaldi_aslp_tpu.feats.mfcc import lifter_coeffs


class Spectrogram:
    """Log power spectrogram (reference: feature-spectrogram.cc)."""

    def __init__(self, frame_opts: FrameExtractionOptions | None = None):
        self.frame_opts = frame_opts or FrameExtractionOptions()
        self._window = jnp.asarray(window_function(self.frame_opts))

    @property
    def dim(self) -> int:
        return self.frame_opts.padded_window_size // 2 + 1

    def __call__(self, waveform, key=None) -> jnp.ndarray:
        wav = np.asarray(waveform, np.float32)
        n_true = num_frames(len(wav), self.frame_opts)
        bucket = int(self.frame_opts.samp_freq)
        padded = int(np.ceil(max(len(wav), 1) / bucket)) * bucket
        if padded > len(wav):
            wav = np.pad(wav, (0, padded - len(wav)))
        return self._compute(jnp.asarray(wav), key)[:n_true]

    @partial(jax.jit, static_argnums=0)
    def _compute(self, waveform, key):
        frames = extract_frames(waveform, self.frame_opts)
        frames, log_energy = process_window(
            frames, self.frame_opts, self._window, key
        )
        power = compute_power_spectrum(frames, self.frame_opts)
        out = jnp.log(jnp.maximum(power, jnp.finfo(jnp.float32).tiny))
        return out.at[:, 0].set(log_energy)


@dataclasses.dataclass
class PlpOptions(Config):
    lpc_order: int = 12
    num_ceps: int = 13
    use_energy: bool = True
    energy_floor: float = 0.0
    compress_factor: float = 0.33333
    cepstral_lifter: float = 22.0
    cepstral_scale: float = 1.0


def equal_loudness_curve(mel_opts: MelBanksOptions,
                         frame_opts: FrameExtractionOptions) -> np.ndarray:
    """Per-mel-bin equal loudness weights (reference:
    mel-computations.cc ComputeEqualLoudness)."""
    # center frequencies of the mel bins
    from kaldi_aslp_tpu.feats.mel import inverse_mel_scale, mel_scale

    nyquist = 0.5 * frame_opts.samp_freq
    high = mel_opts.high_freq if mel_opts.high_freq > 0 else \
        nyquist + mel_opts.high_freq
    mel_low = mel_scale(mel_opts.low_freq)
    mel_high = mel_scale(high)
    delta = (mel_high - mel_low) / (mel_opts.num_bins + 1)
    out = np.zeros(mel_opts.num_bins)
    for b in range(mel_opts.num_bins):
        fsq = inverse_mel_scale(mel_low + (b + 1) * delta) ** 2
        fsub = fsq / (fsq + 1.6e5)
        out[b] = fsub * fsub * ((fsq + 1.44e6) / (fsq + 9.61e6))
    return out.astype(np.float32)


def _levinson_durbin(autocorr: np.ndarray, order: int):
    """[.., order+1] autocorrelation → (lpc coeffs [.., order], gain)."""
    n = autocorr.shape[0]
    a = np.zeros((n, order))
    err = autocorr[:, 0].copy()
    for i in range(order):
        acc = autocorr[:, i + 1].copy()
        for j in range(i):
            acc -= a[:, j] * autocorr[:, i - j]
        k = acc / np.maximum(err, 1e-20)
        new_a = a.copy()
        new_a[:, i] = k
        for j in range(i):
            new_a[:, j] = a[:, j] - k * a[:, i - 1 - j]
        a = new_a
        err = err * (1.0 - k * k)
    return a, np.maximum(err, 1e-20)


def _lpc_to_cepstrum(a: np.ndarray, gain: np.ndarray,
                     num_ceps: int) -> np.ndarray:
    """LPC → cepstra recursion (reference: feature-functions.cc
    Lpc2Cepstrum)."""
    n, order = a.shape
    c = np.zeros((n, num_ceps))
    c[:, 0] = -np.log(np.maximum(gain, 1e-20))  # C0 = -log residual? use
    # kaldi convention: c0 = log energy of residual (sign flips cancel in
    # liftering); keep log(gain)
    c[:, 0] = np.log(np.maximum(gain, 1e-20))
    for m in range(1, num_ceps):
        if m <= order:
            acc = a[:, m - 1].copy()
        else:
            acc = np.zeros(n)
        for k in range(1, m):
            if m - k <= order:
                acc += (k / m) * c[:, k] * a[:, m - k - 1]
        c[:, m] = acc
    return c


class Plp:
    """PLP features (reference: feature-plp.cc Plp::Compute).

    Filterbank/compression run batched on device; the tiny LPC solve is
    host numpy per utterance."""

    def __init__(self, frame_opts: FrameExtractionOptions | None = None,
                 mel_opts: MelBanksOptions | None = None,
                 plp_opts: PlpOptions | None = None):
        self.frame_opts = frame_opts or FrameExtractionOptions()
        self.mel_opts = mel_opts or MelBanksOptions()
        self.opts = plp_opts or PlpOptions()
        self._mel = jnp.asarray(
            mel_banks_matrix(self.mel_opts, self.frame_opts)
        )
        self._eql = jnp.asarray(
            equal_loudness_curve(self.mel_opts, self.frame_opts)
        )
        self._window = jnp.asarray(window_function(self.frame_opts))
        self._lifter = lifter_coeffs(self.opts.cepstral_lifter,
                                     self.opts.num_ceps) \
            if self.opts.cepstral_lifter != 0 else None

    @property
    def dim(self) -> int:
        return self.opts.num_ceps

    def __call__(self, waveform, key=None) -> np.ndarray:
        wav = np.asarray(waveform, np.float32)
        n_true = num_frames(len(wav), self.frame_opts)
        bucket = int(self.frame_opts.samp_freq)
        padded = int(np.ceil(max(len(wav), 1) / bucket)) * bucket
        if padded > len(wav):
            wav = np.pad(wav, (0, padded - len(wav)))
        audspec, log_energy = self._device_part(jnp.asarray(wav), key)
        audspec = np.asarray(audspec)[:n_true]
        log_energy = np.asarray(log_energy)[:n_true]
        # autocorrelation via inverse DFT of the (symmetrized) auditory
        # spectrum (reference: feature-plp.cc idft)
        B = audspec.shape[1]
        # duplicate first/last bins (kaldi pads the spectrum)
        padded_spec = np.concatenate(
            [audspec[:, :1], audspec, audspec[:, -1:]], axis=1
        )
        M = padded_spec.shape[1]
        order = self.opts.lpc_order
        freqs = np.pi * np.arange(M) / (M - 1)
        idft = np.cos(np.outer(np.arange(order + 1), freqs))
        idft[:, 0] *= 0.5
        idft[:, -1] *= 0.5
        autocorr = padded_spec @ idft.T / (M - 1)
        a, gain = _levinson_durbin(autocorr, order)
        ceps = _lpc_to_cepstrum(a, gain, self.opts.num_ceps)
        if self._lifter is not None:
            ceps = ceps * np.concatenate([[1.0], self._lifter[1:]])
        if self.opts.use_energy:
            e = log_energy
            if self.opts.energy_floor > 0:
                e = np.maximum(e, math.log(self.opts.energy_floor))
            ceps[:, 0] = e
        return ceps.astype(np.float32)

    @partial(jax.jit, static_argnums=0)
    def _device_part(self, waveform, key):
        frames = extract_frames(waveform, self.frame_opts)
        frames, log_energy = process_window(
            frames, self.frame_opts, self._window, key
        )
        power = compute_power_spectrum(frames, self.frame_opts)
        mel_energies = jnp.dot(power[:, :-1], self._mel,
                               preferred_element_type=jnp.float32)
        audspec = (mel_energies * self._eql) ** self.opts.compress_factor
        return audspec, log_energy
