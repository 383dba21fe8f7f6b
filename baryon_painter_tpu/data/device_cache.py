"""Device-resident stack cache: sample assembly inside the jit step.

The reference assembles every sample on the host (memmap reads + numpy
transforms inside __getitem__, datasets.py:305-344) and ships ~4 MB per
sample to the device. On TPU - especially behind a network-attached chip -
that host->device traffic dominates the step time. This cache uploads the
raw stacks to HBM ONCE and performs

    dynamic-slice tile gather -> dihedral transform -> 100+150 sum ->
    SLICS scaling

inside the compiled step, so the only per-step transfer is a (B, 9) int32
array of sample-index digits (~200 bytes).

Memory: stacks cost n_field * n_z * (n_100 + n_150) * n_grid^2 * 4 bytes.
``fits(dataset)`` estimates this against a budget; the trainer falls back to
the host path when the cache does not fit (e.g. the full 11-redshift BAHAMAS
set exceeds one chip's HBM; a multi-chip mesh shards it implicitly by z via
the host fallback or an explicit per-z schedule).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from baryon_painter_tpu.data.dataset import (BahamasTileDataset,
                                             slics_scale_factor)

__all__ = ["DeviceStackCache"]


def _dihedral_jnp(tile, perm):
    """Dihedral transform of (..., H, W) by traced perm in [0, 8);
    perm = rot*2 + flip (same convention as data/indexing.py)."""
    def make(rot, flip):
        def f(t):
            out = jnp.rot90(t, k=rot, axes=(-2, -1)) if rot else t
            return out[..., ::-1] if flip else out
        return f
    branches = [make(r, f) for r in range(4) for f in range(2)]
    return jax.lax.switch(perm, branches, tile)


class DeviceStackCache:
    def __init__(self, dataset: BahamasTileDataset,
                 dtype=jnp.float32, device=None,
                 use_pallas="auto"):
        """``use_pallas`` selects the scalar-prefetch DMA gather kernel
        (ops/pallas_gather.py) over vmap'd dynamic slices; 'auto' enables it
        on TPU backends (measured 2.1x faster there, bit-exact). Mosaic
        requires the sliced minor dims to be 128-aligned, so tiles smaller
        than the 128-lane register stay on the XLA path."""
        if use_pallas == "auto":
            use_pallas = (jax.default_backend() == "tpu"
                          and dataset.tile_size % 128 == 0)
        self.use_pallas = use_pallas
        self.dataset = dataset
        self.tile_size = dataset.tile_size
        self.n_label = len(dataset.label_fields)
        fields = dataset.fields
        zs = dataset.redshifts

        def stack_all(depth):
            arr = np.stack([
                np.stack([np.asarray(dataset.data[f][z][depth],
                                     dtype=np.float32) for z in zs])
                for f in fields])  # (F, Z, S, G, G)
            return jnp.asarray(arr, dtype=dtype)

        self.data100 = stack_all("100")
        self.data150 = stack_all("150")
        if device is not None:
            self.data100 = jax.device_put(self.data100, device)
            self.data150 = jax.device_put(self.data150, device)
        self.z_values = jnp.asarray(dataset.redshifts, jnp.float32)
        self.input_scale = (slics_scale_factor(dataset.n_grid)
                            if dataset.scale_to_SLICS else 1.0)

    @staticmethod
    def nbytes(dataset: BahamasTileDataset) -> int:
        f = len(dataset.fields)
        z = len(dataset.redshifts)
        s = dataset.n_stack_100 + dataset.n_stack_150
        return f * z * s * dataset.n_grid ** 2 * 4

    @classmethod
    def fits(cls, dataset: BahamasTileDataset,
             budget_bytes: int = 8 * 1024 ** 3) -> bool:
        return cls.nbytes(dataset) <= budget_bytes

    # ------------------------------------------------------------------ #

    def digits(self, idx: np.ndarray) -> np.ndarray:
        """Host-side decode of sample indices into (B, 9) int32 digits."""
        s = self.dataset.scheme.decode(np.asarray(idx, dtype=np.int64))
        off = self.dataset.stack_offset
        return np.stack([s.z, s.p100, s.p150, s.s100 + off, s.tx100, s.ty100,
                         s.s150 + off, s.tx150, s.ty150],
                        axis=-1).astype(np.int32)

    def gather(self, digits):
        """(B, 9) digits -> (input (B,T,T) f32, labels (n_label,B,T,T), z (B,)).

        Pure jnp; call inside jit. Gathers both depths for all fields with
        two dynamic slices per sample, applies per-depth dihedral transforms,
        sums, and applies the SLICS input scaling.
        """
        t = self.tile_size
        F = self.data100.shape[0]

        if self.use_pallas:
            from baryon_painter_tpu.ops.pallas_gather import \
                gather_tiles_pallas
            interpret = jax.default_backend() == "cpu"
            tiles = gather_tiles_pallas(self.data100, self.data150,
                                        jnp.asarray(digits), t,
                                        interpret=interpret)
            tiles = tiles.astype(jnp.float32)
            zs = self.z_values[digits[:, 0]]
            inputs = tiles[:, 0] * self.input_scale
            labels = jnp.moveaxis(tiles[:, 1:], 1, 0)
            return inputs, labels, zs

        def one(d):
            z_i, p100, p150 = d[0], d[1], d[2]
            tile100 = jax.lax.dynamic_slice(
                self.data100, (0, z_i, d[3], d[4] * t, d[5] * t),
                (F, 1, 1, t, t))[:, 0, 0]
            tile150 = jax.lax.dynamic_slice(
                self.data150, (0, z_i, d[6], d[7] * t, d[8] * t),
                (F, 1, 1, t, t))[:, 0, 0]
            tile100 = _dihedral_jnp(tile100, p100)
            tile150 = _dihedral_jnp(tile150, p150)
            return (tile100 + tile150).astype(jnp.float32)

        tiles = jax.vmap(one)(jnp.asarray(digits))  # (B, F, T, T)
        zs = self.z_values[digits[:, 0]]
        inputs = tiles[:, 0] * self.input_scale
        labels = jnp.moveaxis(tiles[:, 1:], 1, 0)  # (n_label, B, T, T)
        return inputs, labels, zs
