"""Differentiable P(k)-fidelity loss shared by the CVAE and CGAN trainers.

The fidelity gate (BASELINE.md; reference validation_plotting.py:76-158) is
the fractional error of the painted auto- and cross-P(k) against the truth,
per redshift. This loss term matches the batch-mean spectra of a painted
batch (already inverse-transformed to physical space — the exact paint-time
code path) to the truth's:

- auto spectra are positive: squared log-ratio, scale-free across the ~6
  decades of P(k);
- cross spectra are signed and pass through ~0 at high k where the true
  correlation is weak — a log|.| there explodes and destroys training
  (observed: cross error 0.04 -> 1.0); the relative error against |P_ct|
  anchors sign AND magnitude instead.

With ``redshifts`` given, one masked batch-mean is computed per redshift and
the errors averaged — the gate is per-z, and a pooled mixed-z loss lets the
model overshoot one z and undershoot another with a perfect z-averaged
spectrum (observed: pooled auto error 1.5% hiding per-z errors of 10%).
Feed z-balanced batches so every z is populated each step.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from baryon_painter_tpu.power_spectrum import pseudo_pofk_2d

__all__ = ["pk_fidelity_loss"]


def pk_fidelity_loss(pred, truth, dm, L: float, n_bins: int, z=None,
                     redshifts: Optional[Sequence[float]] = None):
    """Spectral fidelity loss between painted and truth batches.

    Args:
      pred, truth, dm: (N, H, W) physical-space fields.
      L: tile side length [Mpc/h].
      n_bins: number of log-spaced k bins.
      z: (N,) per-sample redshifts; required when ``redshifts`` is given.
      redshifts: static list of training redshifts for the per-z variant,
        or None for a pooled batch-mean.
    """
    def sample_pk(a, b=None):
        pk, _, _, nm = pseudo_pofk_2d(a, b, L=L, n_k_bin=n_bins)
        return pk, nm > 0  # pk: (N, n_bins)

    pk_p, occ = sample_pk(pred)
    pk_t, _ = sample_pk(truth)
    pk_cp, _ = sample_pk(pred, dm)
    pk_ct, _ = sample_pk(truth, dm)

    if redshifts is not None:
        zs = jnp.asarray(list(redshifts), dtype=jnp.float32)
        w = (z[None, :].astype(jnp.float32) == zs[:, None]).astype(
            jnp.float32)                            # (n_z, N)
        cnt = jnp.maximum(w.sum(axis=1, keepdims=True), 1.0)
        mean = lambda pk: (w @ pk) / cnt            # (n_z, n_bins)
        present = (w.sum(axis=1) > 0)[:, None]      # z's in this batch
    else:
        mean = lambda pk: pk.mean(axis=0, keepdims=True)
        present = jnp.ones((1, 1), bool)

    m_p, m_t = mean(pk_p), mean(pk_t)
    m_cp, m_ct = mean(pk_cp), mean(pk_ct)
    use = occ[None, :] & present
    auto = jnp.where(use, jnp.log(m_p + 1e-30) - jnp.log(m_t + 1e-30), 0.0)
    cross = jnp.where(use, (m_cp - m_ct) / (jnp.abs(m_ct) + 1e-30), 0.0)
    n = jnp.maximum(use.sum(), 1)
    return ((auto ** 2).sum() + (cross ** 2).sum()) / n
