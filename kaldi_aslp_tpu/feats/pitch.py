"""Pitch features: NCCF + Viterbi pitch tracking.

TPU-native equivalent of the reference pitch extractor (reference:
src/feat/pitch-functions.{h,cc} compute-kaldi-pitch-feats, the
Ghahremani et al. 2014 algorithm): per-frame normalized cross-correlation
over the candidate lag range, Viterbi smoothing over lag trajectories
with an octave-jump penalty, and the standard 2-dim output
(POV feature, log-pitch) plus the post-processing used by recipes
(mean-subtracted log pitch, delta pitch).

The NCCF grid is one batched einsum on device; the tiny lag-Viterbi is a
lax.scan."""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from kaldi_aslp_tpu.utils.config import Config


@dataclasses.dataclass
class PitchOptions(Config):
    samp_freq: float = 16000.0
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    min_f0: float = 50.0
    max_f0: float = 400.0
    penalty_factor: float = 0.1     # octave-jump transition cost
    lag_penalty: float = 0.05       # short-lag preference (kills
    # subharmonic octave errors; the soft_min_f0 role in the reference)
    nccf_ballast: float = 7000.0


def _nccf_grid(wave: jnp.ndarray, opts: PitchOptions):
    """[num_frames, num_lags] NCCF values + the lag array."""
    sr = opts.samp_freq
    shift = int(sr * opts.frame_shift_ms / 1000)
    window = int(sr * opts.frame_length_ms / 1000)
    min_lag = int(sr / opts.max_f0)
    max_lag = int(sr / opts.min_f0)
    lags = jnp.arange(min_lag, max_lag + 1)
    n = wave.shape[0]
    num_frames = max(0, 1 + (n - window - max_lag) // shift)
    starts = jnp.arange(num_frames) * shift
    win_idx = starts[:, None] + jnp.arange(window)[None, :]
    x1 = wave[win_idx]                              # [T, W]
    e1 = jnp.sum(x1 * x1, axis=1)                   # [T]
    mean_sq = jnp.mean(wave * wave)
    ballast = opts.nccf_ballast * mean_sq * window

    def per_lag(lag):
        x2 = wave[win_idx + lag]
        num = jnp.sum(x1 * x2, axis=1)
        e2 = jnp.sum(x2 * x2, axis=1)
        return num / jnp.sqrt(e1 * e2 + ballast + 1e-20)

    nccf = jax.vmap(per_lag, out_axes=1)(lags)      # [T, L]
    return nccf, np.arange(min_lag, max_lag + 1)


@partial(jax.jit, static_argnames=("penalty",))
def _lag_viterbi(nccf, log_lags, penalty: float):
    """Smoothed best lag per frame: maximize Σ nccf − penalty·Δlog-lag²."""
    L = nccf.shape[1]
    cost_mat = penalty * (log_lags[:, None] - log_lags[None, :]) ** 2

    def step(prev_score, nccf_t):
        # prev_score: [L]; transition to each new lag j
        trans = prev_score[:, None] - cost_mat      # [L_prev, L_new]
        best_prev = jnp.max(trans, axis=0)
        bp = jnp.argmax(trans, axis=0)
        score = best_prev + nccf_t
        return score, (score, bp)

    init = nccf[0]
    _, (scores, bps) = jax.lax.scan(step, init, nccf[1:])
    return init, scores, bps


def compute_pitch(wave: np.ndarray,
                  opts: PitchOptions | None = None) -> np.ndarray:
    """[n_samples] → [T, 2] features: (POV/NCCF feature, log-pitch)."""
    opts = opts or PitchOptions()
    wave = jnp.asarray(np.asarray(wave, np.float32))
    nccf, lags = _nccf_grid(wave, opts)
    nccf_np = np.asarray(nccf)
    T = nccf_np.shape[0]
    if T == 0:
        return np.zeros((0, 2), np.float32)
    log_lags_np = np.log(lags.astype(np.float64))
    log_lags = jnp.asarray(log_lags_np, jnp.float32)
    # local score: NCCF minus a mild long-lag penalty (subharmonics of a
    # periodic signal score equal NCCF; prefer the fundamental)
    local = nccf - opts.lag_penalty * jnp.asarray(
        log_lags_np - log_lags_np[0], jnp.float32
    )[None, :]
    init, scores, bps = _lag_viterbi(local, log_lags,
                                     float(opts.penalty_factor))
    scores = np.concatenate([np.asarray(init)[None], np.asarray(scores)])
    bps = np.asarray(bps)
    # backtrace
    best = np.zeros(T, np.int64)
    best[-1] = scores[-1].argmax()
    for t in range(T - 2, -1, -1):
        best[t] = bps[t, best[t + 1]]
    pitch = opts.samp_freq / lags[best]
    pov = nccf_np[np.arange(T), best]
    return np.stack([pov, np.log(pitch)], axis=1).astype(np.float32)


def postprocess_pitch(raw: np.ndarray,
                      cmn_window: int = 151) -> np.ndarray:
    """3-dim recipe features (reference: process-kaldi-pitch-feats):
    (pov, mean-subtracted log pitch, delta log pitch)."""
    pov = raw[:, 0]
    logp = raw[:, 1]
    T = len(raw)
    half = cmn_window // 2
    norm = np.empty_like(logp)
    for t in range(T):
        s, e = max(0, t - half), min(T, t + half + 1)
        norm[t] = logp[t] - logp[s:e].mean()
    delta = np.gradient(logp)
    return np.stack([pov, norm, delta], axis=1).astype(np.float32)
