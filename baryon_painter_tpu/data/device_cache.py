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
the host path when the cache does not fit on one chip.

Mesh-sharded mode (``mesh=``): the stacks are sharded over the mesh's
"data" axis along the redshift dimension, so a training set that exceeds
one chip's HBM (the full 11-redshift BAHAMAS set, SURVEY datasets.py:157)
lives distributed across the slice. The design keeps the data path free of
collectives: redshift slots are assigned round-robin to devices (every
device holds >= 1 real z; z's are replicated when devices outnumber
redshifts), batches are assembled z-grouped per device
(``sample_mesh_indices``), and the gather runs under ``shard_map`` with
purely shard-local dynamic slices — the only cross-device traffic is the
gradient psum the DP mesh already does.
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


def _slot_assignment(n_z: int, n_dev: int):
    """Round-robin redshift→slot layout for z-sharding over n_dev devices.

    Returns (slot_to_z, slab) where slot_to_z has length n_dev*slab,
    slab = ceil(n_z / n_dev); device d owns slots [d*slab, (d+1)*slab).
    Slot (d, j) holds z index d + j*n_dev when that exists; devices beyond
    n_z replicate z = d % n_z in their first slot; remaining slots are
    padding (-1). Every device holds at least one real redshift.
    """
    slab = max(1, -(-n_z // n_dev))
    slot_to_z = []
    for d in range(n_dev):
        for j in range(slab):
            z = d + j * n_dev
            if z < n_z:
                slot_to_z.append(z)
            elif j == 0:
                slot_to_z.append(d % n_z)  # replicate: device has no real z
            else:
                slot_to_z.append(-1)
    return slot_to_z, slab


class DeviceStackCache:
    def __init__(self, dataset: BahamasTileDataset,
                 dtype=jnp.float32, device=None,
                 use_pallas="auto", mesh=None, mesh_axis: str = "data"):
        """``use_pallas`` selects the scalar-prefetch DMA gather kernel
        (ops/pallas_gather.py) over vmap'd dynamic slices; 'auto' enables it
        on TPU backends (measured 2.1x faster there, bit-exact). Mosaic
        requires the sliced minor dims to be 128-aligned, so tiles smaller
        than the 128-lane register stay on the XLA path.

        ``mesh``: z-shard the stacks over ``mesh_axis`` (see module
        docstring). Batches must then be assembled with
        ``sample_mesh_indices`` (device-grouped, z-local rows)."""
        if use_pallas == "auto":
            use_pallas = (jax.default_backend() == "tpu"
                          and dataset.tile_size % 128 == 0)
        self.use_pallas = use_pallas
        self.dataset = dataset
        self.tile_size = dataset.tile_size
        self.n_label = len(dataset.label_fields)
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        fields = dataset.fields
        zs = dataset.redshifts

        if mesh is None:
            z_order = list(range(len(zs)))
            self._slab = len(zs)
            self._n_dev = 1
        else:
            self._n_dev = mesh.shape[mesh_axis]
            z_order, self._slab = _slot_assignment(len(zs), self._n_dev)
        self._slot_to_z = np.asarray(z_order, np.int64)

        def stack_all(depth):
            one_z = lambda z: np.stack([
                np.asarray(dataset.data[f][z][depth], dtype=np.float32)
                for f in fields])  # (F, S, G, G)
            zero = np.zeros_like(one_z(zs[0]))
            arr = np.stack([one_z(zs[zi]) if zi >= 0 else zero
                            for zi in z_order], axis=1)  # (F, slots, S, G, G)
            # stay in host memory (ml_dtypes handles bf16); the device_put
            # below places each shard directly — materializing the full
            # un-sharded array on device 0 first would OOM on exactly the
            # datasets the z-sharding exists for
            return arr.astype(np.dtype(dtype), copy=False)

        host100 = stack_all("100")
        host150 = stack_all("150")
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            spec = NamedSharding(mesh, P(None, mesh_axis))
            self.data100 = jax.device_put(host100, spec)
            self.data150 = jax.device_put(host150, spec)
        elif device is not None:
            self.data100 = jax.device_put(host100, device)
            self.data150 = jax.device_put(host150, device)
        else:
            self.data100 = jnp.asarray(host100)
            self.data150 = jnp.asarray(host150)
        # z VALUE per slot (padding slots -> 0; never referenced by digits)
        z_arr = np.asarray(dataset.redshifts, np.float32)
        # host numpy -> tiny jit constant (a closed-over device array forces
        # a device->host fetch at every lowering)
        self.z_values = np.where(
            self._slot_to_z >= 0,
            z_arr[np.maximum(self._slot_to_z, 0)], 0.0).astype(np.float32)
        # Per-slot importance weights undoing the z-sampling skew (ADVICE r2):
        # equal per-device quotas + uniform sampling over each device's local
        # z set give redshift z the marginal p(z) = sum_d 1/(n_dev*n_local_d)
        # over devices holding z. When n_z % n_dev != 0 this is non-uniform
        # (e.g. 11 z / 8 devices: single-z devices sample their z at 2x the
        # rate of two-z devices). w_z = (1/n_z)/p(z) has mean ~1 over the
        # realized batch distribution and restores the uniform-z expected
        # gradient when passed as the ELBO's sample_weight.
        #
        # Known residual skew the weights canNOT fix (documented in
        # docs/scaling.md): (1) batch-norm statistics — batch means/vars and
        # the EMA running stats still see the over-sampled redshifts at their
        # realized (non-uniform) rate, a second-order normalization bias;
        # (2) a POOLED spectral loss (pk_loss_per_z=False) averages spectra
        # across the batch before the loss, so per-sample weights cannot be
        # applied — use pk_loss_per_z=True on a skewed mesh (the trainers
        # warn about this combination).
        n_z = len(zs)
        p_z = np.zeros(n_z)
        for d in range(self._n_dev):
            local = {self._slot_to_z[s]
                     for s in range(d * self._slab, (d + 1) * self._slab)
                     if self._slot_to_z[s] >= 0}
            for zi in local:
                p_z[zi] += 1.0 / (self._n_dev * len(local))
        w_z = (1.0 / n_z) / np.maximum(p_z, 1e-12)
        # host numpy (becomes a tiny jit constant; a device array here would
        # force a fetch at every lowering)
        self.z_slot_weights = np.where(
            self._slot_to_z >= 0,
            w_z[np.maximum(self._slot_to_z, 0)], 0.0).astype(np.float32)
        self.uniform_z = bool(np.allclose(w_z, 1.0))
        # per-device slot lookup: slot_of[d, z] = global slot holding z in
        # device d's slab, or -1
        n_slots = len(z_order)
        slot_of = np.full((self._n_dev, len(zs)), -1, np.int64)
        for s in range(n_slots - 1, -1, -1):  # earlier slot wins
            if z_order[s] >= 0:
                slot_of[s // self._slab, z_order[s]] = s
        self._slot_of = slot_of
        self.input_scale = (slics_scale_factor(dataset.n_grid)
                            if dataset.scale_to_SLICS else 1.0)

    @staticmethod
    def nbytes(dataset: BahamasTileDataset, n_shards: int = 1) -> int:
        """PER-DEVICE bytes; with n_shards > 1, the z axis is slab-sharded
        (slab = ceil(n_z / n_shards) redshifts resident per device)."""
        f = len(dataset.fields)
        z = len(dataset.redshifts)
        slab = max(1, -(-z // n_shards))
        s = dataset.n_stack_100 + dataset.n_stack_150
        return f * slab * s * dataset.n_grid ** 2 * 4

    @classmethod
    def fits(cls, dataset: BahamasTileDataset,
             budget_bytes: int = 8 * 1024 ** 3, n_shards: int = 1) -> bool:
        return cls.nbytes(dataset, n_shards) <= budget_bytes

    @classmethod
    def create_if_fits(cls, dataset: BahamasTileDataset,
                       budget_bytes: int = 8 * 1024 ** 3,
                       mesh=None,
                       mesh_axis: str = "data") -> Optional["DeviceStackCache"]:
        """Budget-gated constructor shared by both trainers: returns the
        cache, or None (with a warning) when the per-device stacks exceed
        ``budget_bytes`` and the caller should use the host batch path."""
        n_shards = mesh.shape[mesh_axis] if mesh is not None else 1
        if not cls.fits(dataset, budget_bytes, n_shards=n_shards):
            import warnings
            warnings.warn(
                f"device_data=True but the stacks need "
                f"{cls.nbytes(dataset, n_shards) / 2**30:.1f} GiB/device "
                f"(> budget {budget_bytes / 2**30:.1f} GiB); falling back "
                "to the host batch path.", stacklevel=3)
            return None
        return cls(dataset, mesh=mesh, mesh_axis=mesh_axis)

    # ------------------------------------------------------------------ #

    def digits(self, idx: np.ndarray) -> np.ndarray:
        """Host-side decode of sample indices into (B, 9) int32 digits.

        The first digit is the z SLOT (== z index when unsharded). In
        mesh-sharded mode rows must be device-grouped (sample_mesh_indices)
        so each row's z resolves to a slot in its own device's slab."""
        s = self.dataset.scheme.decode(np.asarray(idx, dtype=np.int64))
        off = self.dataset.stack_offset
        if self._n_dev == 1:
            z_slot = s.z
        else:
            b = len(s.z)
            if b % self._n_dev:
                raise ValueError(f"batch {b} not divisible by the "
                                 f"{self._n_dev}-device mesh")
            dev = np.arange(b) // (b // self._n_dev)
            z_slot = self._slot_of[dev, s.z]
            if (z_slot < 0).any():
                bad = np.nonzero(z_slot < 0)[0][0]
                raise ValueError(
                    f"row {bad}: z index {s.z[bad]} is not resident on "
                    f"device {dev[bad]} — assemble batches with "
                    "sample_mesh_indices")
        return np.stack([z_slot, s.p100, s.p150, s.s100 + off, s.tx100,
                         s.ty100, s.s150 + off, s.tx150, s.ty150],
                        axis=-1).astype(np.int32)

    def sample_mesh_indices(self, rng, batch_size: int) -> np.ndarray:
        """Device-grouped batch: row block d references only redshifts
        resident on mesh device d (uniform over its slab)."""
        if batch_size % self._n_dev:
            raise ValueError(f"batch {batch_size} not divisible by the "
                             f"{self._n_dev}-device mesh")
        per = batch_size // self._n_dev
        zs = self.dataset.redshifts
        out = []
        for d in range(self._n_dev):
            local = sorted({self._slot_to_z[s]
                            for s in range(d * self._slab,
                                           (d + 1) * self._slab)
                            if self._slot_to_z[s] >= 0})
            for zi in rng.choice(len(local), size=per):
                out.append(self.dataset.sample_indices(
                    rng, 1, z=zs[local[zi]]))
        return np.concatenate(out)

    def _gather_tiles(self, d100, d150, digits):
        """(B, 9) digits -> (B, F, T, T) summed+transformed tiles, slicing
        the given (local) stack arrays. digits[:, 0] must index d100's z
        axis directly.

        Both paths gather the raw per-depth tiles first and apply the
        per-sample dihedral with the BATCHED transpose/reverse decomposition
        (ops/pallas_gather.dihedral_batch): a vmap'd lax.switch materializes
        all 8 branches under a batched predicate, and in-kernel MXU flips
        burn T^3 flops — both measured 10-30x slower at 512^2."""
        from baryon_painter_tpu.ops.pallas_gather import dihedral_batch
        t = self.tile_size
        F = d100.shape[0]
        digits = jnp.asarray(digits)

        if self.use_pallas:
            from baryon_painter_tpu.ops.pallas_gather import \
                gather_tiles_pallas
            interpret = jax.default_backend() == "cpu"
            both = gather_tiles_pallas(d100, d150, digits, t,
                                       interpret=interpret)
            t100, t150 = both[:, 0], both[:, 1]
        else:
            def one(d):
                z_i = d[0]
                tile100 = jax.lax.dynamic_slice(
                    d100, (0, z_i, d[3], d[4] * t, d[5] * t),
                    (F, 1, 1, t, t))[:, 0, 0]
                tile150 = jax.lax.dynamic_slice(
                    d150, (0, z_i, d[6], d[7] * t, d[8] * t),
                    (F, 1, 1, t, t))[:, 0, 0]
                return tile100, tile150

            t100, t150 = jax.vmap(one)(digits)

        t100 = dihedral_batch(t100, digits[:, 1])
        t150 = dihedral_batch(t150, digits[:, 2])
        return (t100 + t150).astype(jnp.float32)

    @property
    def stacks(self):
        """The HBM-resident stack arrays as a pytree, to be passed as an
        EXPLICIT argument into jit'd functions that call ``gather``.

        Closing over the device arrays instead bakes them into the jaxpr as
        constants: lowering then fetches the full cache back to host to embed
        it in the MLIR module (seconds-to-minutes over a network-attached
        chip, and GB-scale HLO at the 11-redshift 512^2 scale)."""
        return (self.data100, self.data150)

    def gather(self, digits, stacks=None):
        """(B, 9) digits -> (input (B,T,T) f32, labels (n_label,B,T,T), z (B,)).

        Pure jnp; call inside jit. Gathers both depths for all fields with
        two dynamic slices per sample, applies per-depth dihedral transforms,
        sums, and applies the SLICS input scaling. In mesh-sharded mode the
        tile gather runs under shard_map with shard-local slices only: each
        device re-bases the z slot into its slab and slices its local block.

        ``stacks``: pass ``cache.stacks`` through the enclosing jit's
        arguments (see the ``stacks`` property); defaults to the cached
        device arrays for eager/one-off use.
        """
        digits = jnp.asarray(digits)
        data100, data150 = (self.data100, self.data150) \
            if stacks is None else stacks
        if self.mesh is None:
            tiles = self._gather_tiles(data100, data150, digits)
        else:
            try:
                from jax import shard_map
            except ImportError:  # jax < 0.8
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P
            ax = self.mesh_axis
            slab = self._slab

            def body(d100, d150, dig):
                lo = jax.lax.axis_index(ax) * slab
                dig = dig.at[:, 0].add(-lo)
                return self._gather_tiles(d100, d150, dig)

            tiles = shard_map(
                body, mesh=self.mesh,
                in_specs=(P(None, ax), P(None, ax), P(ax)),
                out_specs=P(ax))(data100, data150, digits)

        zs = jnp.asarray(self.z_values)[digits[:, 0]]
        inputs = tiles[:, 0] * self.input_scale
        if self.dataset.subtract_minimum:
            # host-path parity (dataset.get_raw_batch): per-sample tile
            # minimum subtracted from the input field
            inputs = inputs - inputs.min(axis=(1, 2), keepdims=True)
        labels = jnp.moveaxis(tiles[:, 1:], 1, 0)  # (n_label, B, T, T)
        return inputs, labels, zs
