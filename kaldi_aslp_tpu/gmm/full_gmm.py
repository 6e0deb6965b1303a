"""Full-covariance GMMs (reference: src/gmm/full-gmm.{h,cc},
mle-full-gmm.{h,cc} — the "full" half of the inventory's
"diagonal/full GMM + MLE/EBW" row).

Same padded-tensor design as the diagonal model: covariances are one
[P, M, D, D] tensor, log-likelihoods for every pdf/gaussian are two
batched einsums against precomputed Cholesky inverses, MLE accumulates
outer products device-side."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from kaldi_aslp_tpu.gmm.diag_gmm import AmDiagGmm, LOG_2PI


@dataclass
class AmFullGmm:
    weights: np.ndarray  # [P, M]
    means: np.ndarray    # [P, M, D]
    covars: np.ndarray   # [P, M, D, D] (padded entries = I)

    @property
    def num_pdfs(self) -> int:
        return self.weights.shape[0]

    @property
    def dim(self) -> int:
        return self.means.shape[2]

    @classmethod
    def from_diag(cls, am: AmDiagGmm) -> "AmFullGmm":
        """(reference: full-gmm.cc CopyFromDiagGmm)."""
        P, M, D = am.num_pdfs, am.max_gauss, am.dim
        cov = np.zeros((P, M, D, D), np.float32)
        idx = np.arange(D)
        cov[:, :, idx, idx] = am.vars
        return cls(am.weights.copy(), am.means.copy(), cov)

    def to_diag(self) -> AmDiagGmm:
        idx = np.arange(self.dim)
        return AmDiagGmm(self.weights.copy(), self.means.copy(),
                         self.covars[:, :, idx, idx].copy())

    def pack(self):
        """Precompute (log w + gconst, inv-chol) device tensors."""
        P, M, D = self.num_pdfs, self.weights.shape[1], self.dim
        chol = np.linalg.cholesky(
            self.covars + 1e-6 * np.eye(self.dim)
        )                                         # [P, M, D, D]
        inv_chol = np.linalg.inv(chol)            # L^{-1}
        logdet = 2.0 * np.log(
            np.maximum(np.einsum("pmii->pmi", chol), 1e-20)
        ).sum(-1)                                 # [P, M]
        gconst = (np.log(np.maximum(self.weights, 1e-37))
                  - 0.5 * (D * LOG_2PI + logdet))
        return (jnp.asarray(gconst.astype(np.float32)),
                jnp.asarray(self.means),
                jnp.asarray(inv_chol.astype(np.float32)),
                jnp.asarray((self.weights > 0).astype(np.float32)))


def full_gmm_loglikes(feats, gconst, means, inv_chol, active):
    """[T, D] → [T, P] (reference: full-gmm.cc LogLikelihoods).

    log N = gconst − ½‖L⁻¹(x−μ)‖²."""
    diff = feats[:, None, None, :] - means[None]        # [T, P, M, D]
    z = jnp.einsum("pmij,tpmj->tpmi", inv_chol, diff,
                   preferred_element_type=jnp.float32)
    ll = gconst[None] - 0.5 * jnp.sum(z * z, axis=-1)   # [T, P, M]
    ll = jnp.where(active[None] > 0, ll, -1e30)
    return jax.nn.logsumexp(ll, axis=-1)


def full_gmm_accumulate(
    am: AmFullGmm, feats: np.ndarray, pdf_ids: np.ndarray
):
    """MLE stats (reference: mle-full-gmm.cc AccumulateFromFull):
    occ [P, M], mean acc [P, M, D], scatter acc [P, M, D, D]."""
    gconst, means, inv_chol, active = am.pack()
    f = jnp.asarray(feats, jnp.float32)
    pdfs = np.asarray(pdf_ids)
    diff = f[:, None, :] - means[pdfs]                  # [T, M, D]
    z = jnp.einsum("tmij,tmj->tmi", inv_chol[pdfs], diff,
                   preferred_element_type=jnp.float32)
    ll = gconst[pdfs] - 0.5 * jnp.sum(z * z, axis=-1)
    ll = jnp.where(active[pdfs] > 0, ll, -1e30)
    gamma = np.asarray(jax.nn.softmax(ll, axis=-1))     # [T, M]
    P, M, D = am.num_pdfs, am.weights.shape[1], am.dim
    occ = np.zeros((P, M))
    macc = np.zeros((P, M, D))
    sacc = np.zeros((P, M, D, D))
    fn = np.asarray(feats)
    for p in np.unique(pdfs):
        sel = pdfs == p
        g = gamma[sel]
        x = fn[sel]
        occ[p] = g.sum(0)
        macc[p] = g.T @ x
        sacc[p] = np.einsum("tm,ti,tj->mij", g, x, x, optimize=True)
    return occ, macc, sacc


def full_gmm_mle_update(
    am: AmFullGmm, occ, macc, sacc,
    min_occupancy: float = 10.0,
    covar_floor: float = 1e-3,
) -> AmFullGmm:
    """(reference: mle-full-gmm.cc MleFullGmmUpdate)."""
    new = AmFullGmm(am.weights.copy(), am.means.copy(),
                    am.covars.copy())
    D = am.dim
    for p in range(am.num_pdfs):
        active = am.weights[p] > 0
        tot = occ[p, active].sum()
        if tot < 1e-8:
            continue
        for m in np.where(active)[0]:
            if occ[p, m] < min_occupancy:
                continue
            mean = macc[p, m] / occ[p, m]
            cov = sacc[p, m] / occ[p, m] - np.outer(mean, mean)
            # floor eigenvalues for positive-definiteness
            evals, evecs = np.linalg.eigh(cov)
            evals = np.maximum(evals, covar_floor)
            new.means[p, m] = mean
            new.covars[p, m] = (evecs * evals) @ evecs.T
        w = np.maximum(occ[p] * active, 0.0)
        if w.sum() > 0:
            new.weights[p] = (w / w.sum() * active).astype(np.float32)
    return new
