"""Invertible field transforms, TPU-native.

Re-implements the capability surface of the reference's
``baryon_painter/utils/data_transforms.py`` (create_range_compress_transforms
:51-110, create_split_scale_transform :14-42, chain_transformations :44-49,
transform_to_delta :7-11) as *pure jnp functions parameterized by declarative
specs*, so that:

  * transforms run on-device inside the jit'd train/paint step (the reference
    runs them in numpy inside ``__getitem__``),
  * transforms are differentiable (stats interpolation included),
  * checkpoints store a JSON-able spec instead of dill'd closures
    (reference quirk: painter.py:409-417 pickles function bytecode).

Statistics are tables ``(z_grid, mean, var)`` per field; interpolation across
redshift is piecewise linear with clamped ends, matching the reference's
``interpolate_z`` (data_transforms.py:52-64).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FieldStats",
    "RangeCompress",
    "ToDelta",
    "SplitScale",
    "ChainTransform",
    "transform_from_dict",
    "gaussian_filter_2d",
]


# ---------------------------------------------------------------------------
# Per-field statistics with redshift interpolation
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FieldStats:
    """Mean/variance tables over a redshift grid for one field.

    Equivalent of the reference's per-(field, z) ``stats`` dict
    (datasets.py:195-199) stored as arrays so it can live inside jit.
    """

    z_grid: jnp.ndarray  # (n_z,) strictly increasing
    mean: jnp.ndarray    # (n_z,)
    var: jnp.ndarray     # (n_z,)

    def at_z(self, z):
        """Linear interpolation of (mean, var) to redshift ``z``.

        Clamps outside the grid, matching data_transforms.py:52-64.
        ``z`` may be a scalar or a batch of redshifts.

        Implemented as the branch-free cumulative form
        v(z) = v[0] + sum_i clip((z - t_i)/(t_{i+1} - t_i), 0, 1) * dv_i
        instead of jnp.interp: interp's searchsorted+gather lowers to a
        serialized scalar loop on TPU (measured 29 ms per call at batch 24 —
        it was the whole cost of the on-device transform step).
        """
        z = jnp.asarray(z)
        t = self.z_grid
        frac = jnp.clip((z[..., None] - t[:-1]) / (t[1:] - t[:-1]), 0.0, 1.0)
        mean = self.mean[0] + (frac * jnp.diff(self.mean)).sum(-1)
        var = self.var[0] + (frac * jnp.diff(self.var)).sum(-1)
        return mean, var

    # pytree protocol -------------------------------------------------------
    def tree_flatten(self):
        return (self.z_grid, self.mean, self.var), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def to_dict(self):
        return {
            "z_grid": np.asarray(self.z_grid).tolist(),
            "mean": np.asarray(self.mean).tolist(),
            "var": np.asarray(self.var).tolist(),
        }

    @classmethod
    def from_dict(cls, d):
        return cls(
            z_grid=jnp.asarray(d["z_grid"], dtype=jnp.float32),
            mean=jnp.asarray(d["mean"], dtype=jnp.float32),
            var=jnp.asarray(d["var"], dtype=jnp.float32),
        )


def _broadcast_stat(s, x):
    """Broadcast a per-sample scalar stat against trailing image dims of x."""
    s = jnp.asarray(s)
    if s.ndim == 0:
        return s
    return s.reshape(s.shape + (1,) * (x.ndim - s.ndim))


# ---------------------------------------------------------------------------
# Range compression family (6 modes)
# ---------------------------------------------------------------------------

_MODES = ("log", "shift-log", "shift-log-2p", "log-tanh", "x/(1+x)", "1/x")


@dataclasses.dataclass(frozen=True)
class RangeCompress:
    """Invertible range compression; all 6 reference modes.

    Forward/inverse formulas mirror data_transforms.py:66-108 exactly (the
    fiducial config is ``mode='shift-log', k=4``: log(x/sigma + 1)/k).
    """

    mode: str
    k: Any  # float or 2-sequence, mode-dependent
    eps: float = 1e-3
    sqrt_of_mean: bool = False

    def __post_init__(self):
        if self.mode not in _MODES:
            raise ValueError(f"Mode '{self.mode}' not supported; use one of {_MODES}.")

    def _mean_std(self, stats: FieldStats, z, x):
        mean, var = stats.at_z(z)
        if self.sqrt_of_mean:
            mean = jnp.sqrt(mean)
        std = jnp.sqrt(var)
        return _broadcast_stat(mean, x), _broadcast_stat(std, x)

    def forward(self, x, stats: FieldStats, z):
        k, eps, mode = self.k, self.eps, self.mode
        mean, std = self._mean_std(stats, z, x)
        if mode == "log":
            return jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1.0) / std + eps) / k,
                             math.log(eps) / k)
        if mode == "shift-log":
            # Floor the log argument at eps: B-spline zoom in the lightcone
            # path (order 3/5, process_SLICS.py:205) overshoots below zero
            # near sharp features, and x/std + 1 <= 0 would paint the whole
            # plane NaN through the convs. The reference escapes only
            # because its real-data std is O(1); with narrow stats the
            # un-floored formula is a latent NaN source. jnp.maximum keeps
            # NaN inputs NaN (corrupt reads must still fail loudly) and its
            # zero subgradient below the floor avoids log's NaN gradient.
            return jnp.log(jnp.maximum(x / std + 1, eps)) / k
        if mode == "shift-log-2p":
            # same overshoot floor, capped at the mode's own shift k[0] so a
            # legitimate zero pixel (u == k[0]) is never re-mapped when
            # k[0] < eps
            return (jnp.log(jnp.maximum(x / std + k[0], min(eps, k[0])))
                    / k[1])
        if mode == "log-tanh":
            return jnp.where(x > 0, jnp.tanh(jnp.log(jnp.where(x > 0, x, 1.0) / std + eps) / k), -1.0)
        if mode == "x/(1+x)":
            return x / (x + std) * k[0] - k[1]
        if mode == "1/x":
            u = x / (std * mean * k)
            return jnp.where(u > -1, 2 / (u + 1) - 1.001, -1.0)
        raise AssertionError(mode)

    def inverse(self, x, stats: FieldStats, z):
        k, eps, mode = self.k, self.eps, self.mode
        mean, std = self._mean_std(stats, z, x)
        if mode == "log":
            return jnp.where(x > math.log(eps) / k, (jnp.exp(x * k) - eps) * std, 0.0)
        if mode == "shift-log":
            return (jnp.exp(x * k) - 1) * std
        if mode == "shift-log-2p":
            return (jnp.exp(x * k[1]) - k[0]) * std
        if mode == "log-tanh":
            xc = jnp.clip(x, -1 + 1e-7, 1 - 1e-7)
            return jnp.where(x > -1, (jnp.exp(jnp.arctanh(xc) * k) - eps) * std, 0.0)
        if mode == "x/(1+x)":
            return std / (k[0] / (x + k[1]) - 1)
        if mode == "1/x":
            # the forward map's range is (-1.001, -1) for large fields, so
            # the inverse must accept down to -1.001 — a cutoff at -1 would
            # zero exactly the brightest pixels on the round trip
            return jnp.where(x > -1.001,
                             (2 / (x + 1.001) - 1) * std * mean * k, 0.0)
        raise AssertionError(mode)

    def to_dict(self):
        k = list(self.k) if isinstance(self.k, (tuple, list)) else self.k
        return {"type": "range_compress", "mode": self.mode, "k": k,
                "eps": self.eps, "sqrt_of_mean": self.sqrt_of_mean}

    @classmethod
    def from_dict(cls, d):
        k = tuple(d["k"]) if isinstance(d["k"], list) else d["k"]
        return cls(mode=d["mode"], k=k, eps=d.get("eps", 1e-3),
                   sqrt_of_mean=d.get("sqrt_of_mean", False))


@dataclasses.dataclass(frozen=True)
class ToDelta:
    """x -> x/mean - 1 (density contrast); data_transforms.py:7-11."""

    def forward(self, x, stats: FieldStats, z):
        mean, _ = stats.at_z(z)
        return x / _broadcast_stat(mean, x) - 1

    def inverse(self, x, stats: FieldStats, z):
        mean, _ = stats.at_z(z)
        return (x + 1) * _broadcast_stat(mean, x)

    def to_dict(self):
        return {"type": "to_delta"}

    @classmethod
    def from_dict(cls, d):
        return cls()


# ---------------------------------------------------------------------------
# Gaussian blur + split-scale (Gaussian pyramid) transform
# ---------------------------------------------------------------------------

def _gaussian_kernel_1d(sigma: float, truncate: float = 3.0) -> np.ndarray:
    """Matches scipy.ndimage.gaussian_filter1d's kernel construction."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * x * x / (sigma * sigma))
    return (phi / phi.sum()).astype(np.float32)


def gaussian_filter_2d(x, sigma: float, truncate: float = 3.0):
    """Separable Gaussian blur over the last two axes.

    Boundary handling matches scipy.ndimage's default mode='reflect'
    (which is numpy.pad mode='symmetric'). Works on (..., H, W).
    """
    kernel = jnp.asarray(_gaussian_kernel_1d(sigma, truncate))
    r = kernel.shape[0] // 2

    def blur_axis(y, axis):
        y = jnp.moveaxis(y, axis, -1)
        shape = y.shape
        pad = [(0, 0)] * (y.ndim - 1) + [(r, r)]
        yp = jnp.pad(y, pad, mode="symmetric")
        flat = yp.reshape(-1, 1, yp.shape[-1])
        out = jax.lax.conv_general_dilated(
            flat, kernel.reshape(1, 1, -1).astype(y.dtype),
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision="highest",
        )
        return jnp.moveaxis(out.reshape(shape), -1, axis)

    return blur_axis(blur_axis(x, -2), -1)


@dataclasses.dataclass(frozen=True)
class SplitScale:
    """Gaussian-pyramid split of a tile into frequency bands.

    Mirrors create_split_scale_transform (data_transforms.py:14-42): channel 0
    optionally carries the original; the remaining channels sum back to it.
    Input (..., H, W) -> output (..., n_out, H, W).
    """

    n_scale: int = 3
    step_size: int = 4
    include_original: bool = True
    truncate: float = 3.0

    @property
    def n_out(self):
        return self.n_scale + 1 if self.include_original else self.n_scale

    def forward(self, x, stats=None, z=None):
        bands = []
        d_in = x
        for i in range(self.n_scale - 1, 0, -1):
            smooth = gaussian_filter_2d(d_in, sigma=self.step_size ** i / 2,
                                        truncate=self.truncate)
            bands.append(smooth)
            d_in = d_in - smooth
        bands.append(d_in)
        bands = bands[::-1]  # finest first, like the reference layout
        if self.include_original:
            bands = [x] + bands
        return jnp.stack(bands, axis=-3)

    def inverse(self, x, stats=None, z=None):
        if x.shape[-3] != self.n_out:
            raise ValueError(
                f"Invalid shape: expected {self.n_out} scales, got {x.shape[-3]}.")
        if self.include_original:
            return x[..., 0, :, :]
        return x.sum(axis=-3)

    def to_dict(self):
        return {"type": "split_scale", "n_scale": self.n_scale,
                "step_size": self.step_size,
                "include_original": self.include_original,
                "truncate": self.truncate}

    @classmethod
    def from_dict(cls, d):
        return cls(n_scale=d["n_scale"], step_size=d["step_size"],
                   include_original=d["include_original"],
                   truncate=d.get("truncate", 3.0))


# ---------------------------------------------------------------------------
# Chaining
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ChainTransform:
    """Sequential composition; chain_transformations (data_transforms.py:44-49).

    ``inverse`` applies the inverses in reverse order (the reference leaves
    ordering to the caller; here it is handled correctly by construction).
    """

    steps: tuple

    def forward(self, x, stats: FieldStats, z):
        for t in self.steps:
            x = t.forward(x, stats, z)
        return x

    def inverse(self, x, stats: FieldStats, z):
        for t in reversed(self.steps):
            x = t.inverse(x, stats, z)
        return x

    def to_dict(self):
        return {"type": "chain", "steps": [t.to_dict() for t in self.steps]}

    @classmethod
    def from_dict(cls, d):
        return cls(steps=tuple(transform_from_dict(s) for s in d["steps"]))


@dataclasses.dataclass(frozen=True)
class Identity:
    def forward(self, x, stats=None, z=None):
        return x

    def inverse(self, x, stats=None, z=None):
        return x

    def to_dict(self):
        return {"type": "identity"}

    @classmethod
    def from_dict(cls, d):
        return cls()


_REGISTRY = {
    "range_compress": RangeCompress,
    "to_delta": ToDelta,
    "split_scale": SplitScale,
    "chain": ChainTransform,
    "identity": Identity,
}


def transform_from_dict(d: dict):
    """Rebuild a transform from its declarative JSON dict."""
    try:
        cls = _REGISTRY[d["type"]]
    except KeyError:
        raise ValueError(f"Unknown transform type '{d.get('type')}'.")
    return cls.from_dict(d)
