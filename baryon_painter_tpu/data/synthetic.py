"""Synthetic BAHAMAS-like stack fixtures for hermetic tests and benchmarks.

Generates the same on-disk layout the real preprocessing produces
(.npy stacks of shape (n_stack, n_grid, n_grid) per field/redshift/depth plus
a *_files_info pickle — see reference datasets.py:137-163), filled with
positive lognormal-ish random fields with mild spatial correlation so that the
shift-log transforms and P(k) metrics behave like they do on real data.
"""
from __future__ import annotations

import os
import pickle
from typing import List, Sequence

import numpy as np


def _correlated_lognormal(rng, shape, corr_scale=4.0, sigma=1.0, mean=1.0):
    """Positive random field with a red-ish spectrum via FFT filtering."""
    white = rng.standard_normal(shape).astype(np.float32)
    n = shape[-1]
    f = np.fft.fftfreq(n) * n
    k = np.sqrt(f[:, None] ** 2 + f[None, :] ** 2)
    filt = np.exp(-0.5 * (k / (n / corr_scale / 2)) ** 2) + 1e-3
    g = np.fft.ifft2(np.fft.fft2(white) * filt).real
    g = g / g.std() * sigma
    out = np.exp(g.astype(np.float32))
    return out * (mean / out.mean())


def make_synthetic_stacks(root: str,
                          fields: Sequence[str] = ("dm", "pressure"),
                          redshifts: Sequence[float] = (0.0, 0.5, 1.0),
                          n_stack: int = 3,
                          n_grid: int = 64,
                          seed: int = 0,
                          name: str = "test") -> str:
    """Write synthetic stacks + file_info pickle under ``root``.

    Returns the path of the files-info pickle.
    """
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    files: List[dict] = []
    for field in fields:
        base_mean = 1.0 if field == "dm" else 0.3
        for z in redshifts:
            entry = {"field": field, "z": z}
            for depth in ("100", "150"):
                stacks = np.stack([
                    _correlated_lognormal(rng, (n_grid, n_grid),
                                          sigma=1.0, mean=base_mean * (1 + z))
                    for _ in range(n_stack)])
                fn = f"{field}_z{z:.3f}_{depth}.npy"
                np.save(os.path.join(root, fn), stacks)
                entry[f"file_{depth}"] = fn
                entry[f"mean_{depth}"] = float(stacks.mean())
                entry[f"var_{depth}"] = float(stacks.var())
            files.append(entry)
    info_path = os.path.join(root, f"{name}_files_info.pickle")
    with open(info_path, "wb") as f:
        pickle.dump(files, f)
    return info_path
