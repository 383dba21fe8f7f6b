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


def _smooth(x, sigma=1.5):
    n = x.shape[-1]
    f = np.fft.fftfreq(n) * n
    k2 = f[:, None] ** 2 + f[None, :] ** 2
    filt = np.exp(-0.5 * k2 * (2 * np.pi * sigma / n) ** 2)
    return np.fft.ifft2(np.fft.fft2(x) * filt).real.astype(np.float32)


def make_synthetic_stacks(root: str,
                          fields: Sequence[str] = ("dm", "pressure"),
                          redshifts: Sequence[float] = (0.0, 0.5, 1.0),
                          n_stack: int = 3,
                          n_grid: int = 64,
                          seed: int = 0,
                          name: str = "test",
                          pressure_gamma: float = 1.5,
                          pressure_noise: float = 0.1) -> str:
    """Write synthetic stacks + file_info pickle under ``root``.

    The 'pressure' field is physically coupled to 'dm' of the same stack
    (a smoothed polytropic P ~ rho^gamma with multiplicative noise), so that
    models trained on the fixture genuinely learn a dm->pressure mapping and
    P(k) fidelity metrics are meaningful. Other fields are independent
    lognormal draws. Returns the path of the files-info pickle.
    """
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    data = {f: {z: {} for z in redshifts} for f in fields}
    for z in redshifts:
        for depth in ("100", "150"):
            dms, extras = [], {f: [] for f in fields if f not in ("dm", "pressure")}
            pressures = []
            for _ in range(n_stack):
                dm = _correlated_lognormal(rng, (n_grid, n_grid),
                                           sigma=1.0, mean=1.0 * (1 + z))
                dms.append(dm)
                if "pressure" in fields:
                    p = _smooth(dm) ** pressure_gamma
                    p *= np.exp(pressure_noise
                                * rng.standard_normal(dm.shape)).astype(np.float32)
                    p *= 0.3 * (1 + z) / p.mean()
                    pressures.append(p.astype(np.float32))
                for f in extras:
                    extras[f].append(_correlated_lognormal(
                        rng, (n_grid, n_grid), sigma=1.0, mean=0.5 * (1 + z)))
            if "dm" in fields:
                data["dm"][z][depth] = np.stack(dms)
            if "pressure" in fields:
                data["pressure"][z][depth] = np.stack(pressures)
            for f in extras:
                data[f][z][depth] = np.stack(extras[f])

    files: List[dict] = []
    for field in fields:
        for z in redshifts:
            entry = {"field": field, "z": z}
            for depth in ("100", "150"):
                stacks = data[field][z][depth]
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
