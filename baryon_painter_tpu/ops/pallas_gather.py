"""Pallas TPU kernel: sample-tile gather + dihedral from HBM stacks.

The device data path (data/device_cache.py) assembles each training sample by
slicing two tiles out of HBM-resident stack arrays, applying a dihedral
symmetry to each, and summing. The XLA fallback expresses this as a vmap of
dynamic slices; this kernel is the idiomatic Pallas version: the per-sample
index digits arrive via scalar prefetch (PrefetchScalarGridSpec) so the
kernel can issue data-dependent async DMAs from HBM into VMEM scratch, apply
the transform there, and write the assembled sample.

Gated behind ``use_pallas`` in DeviceStackCache.gather-equivalents; equality
with the XLA path is tested in tests/test_pallas_ops.py (interpret mode on
CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_tiles_pallas", "dihedral_vmem", "dihedral_batch"]


def dihedral_vmem(tile, perm):
    """Dihedral transform of (F, T, T) by perm in [0, 8): rot*2 + flip."""
    def make(rot, flip):
        def f(t):
            out = jnp.rot90(t, k=rot, axes=(-2, -1)) if rot else t
            return out[..., ::-1] if flip else out
        return f
    return jax.lax.switch(perm, [make(r, f) for r in range(4)
                                 for f in range(2)], tile)


def dihedral_mxu(tile, perm):
    """Dihedral transform expressed as MXU matmuls (Pallas-TPU lowerable).

    The TPU Pallas lowering has no `rev` primitive, so axis flips are
    multiplications by the anti-identity J (exact: each output element is a
    single product): flip_cols(M) = M @ J, flip_rows(M) = J @ M,
    rot90(M) = J @ M^T. tile is (F, T, T).
    """
    t = tile.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    J = (row + col == t - 1).astype(tile.dtype)

    def rmul(m):  # m @ J == flip of the last axis
        return jax.lax.dot_general(
            m, J, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST).astype(tile.dtype)

    def tr(m):
        return m.swapaxes(-1, -2)

    def rot90(m):   # J @ m^T
        return tr(rmul(m))

    rots = [lambda m: m,
            rot90,
            lambda m: rot90(rot90(m)),
            lambda m: rmul(tr(m))]          # rot270 = m^T @ J
    branches = []
    for r in range(4):
        for f in range(2):
            if f:
                branches.append(lambda m, rr=r: rmul(rots[rr](m)))
            else:
                branches.append(lambda m, rr=r: rots[rr](m))
    return jax.lax.switch(perm, branches, tile)


def dihedral_batch(x, perm):
    """Batched dihedral transform of (B, ..., T, T) by perm (B,) in [0, 8).

    Decomposes rot90^rot . flip^flip (the data/indexing.dihedral_transform
    convention, perm = rot*2 + flip) into at most one transpose + two
    axis reversals,
    selected per sample with jnp.where. This is the fast way to apply a
    PER-SAMPLE dihedral in XLA: a vmap'd lax.switch over a batched predicate
    lowers to a select over ALL 8 fully-materialized branches (8x the
    traffic), and an MXU anti-identity matmul (dihedral_mxu) burns
    T^3 flops per flip — measured 35 ms/step at 512^2 against ~1 ms here.
    """
    rot = perm // 2
    flip = perm % 2
    extra = x.ndim - 1
    bshape = (-1,) + (1,) * extra
    tr = ((rot % 2) == 1).reshape(bshape)
    s = ((rot == 1) | (rot == 2)).reshape(bshape)
    r = ((flip == 1) ^ (rot >= 2)).reshape(bshape)
    x = jnp.where(tr, x.swapaxes(-1, -2), x)
    x = jnp.where(s, x[..., ::-1, :], x)
    x = jnp.where(r, x[..., :, ::-1], x)
    return x


def _gather_kernel(tile_size, digits_ref, d100_ref, d150_ref, out_ref,
                   scratch100, scratch150, sems):
    i = pl.program_id(0)
    t = tile_size
    z = digits_ref[i, 0]
    s100, tx100, ty100 = digits_ref[i, 3], digits_ref[i, 4], digits_ref[i, 5]
    s150, tx150, ty150 = digits_ref[i, 6], digits_ref[i, 7], digits_ref[i, 8]

    copy100 = pltpu.make_async_copy(
        d100_ref.at[:, z, s100, pl.ds(tx100 * t, t), pl.ds(ty100 * t, t)],
        scratch100, sems.at[0])
    copy150 = pltpu.make_async_copy(
        d150_ref.at[:, z, s150, pl.ds(tx150 * t, t), pl.ds(ty150 * t, t)],
        scratch150, sems.at[1])
    copy100.start()
    copy150.start()
    copy100.wait()
    copy150.wait()

    out_ref[0, 0] = scratch100[:]
    out_ref[0, 1] = scratch150[:]


@functools.partial(jax.jit,
                   static_argnames=("tile_size", "interpret"))
def gather_tiles_pallas(data100, data150, digits, tile_size: int,
                        interpret: bool = False):
    """digits (B, 9) -> raw per-depth tiles (B, 2, F, T, T), UNtransformed.

    data100/data150: (F, Z, S, G, G) stack arrays (HBM-resident). The kernel
    is pure data movement (data-dependent async DMAs via scalar prefetch);
    the per-sample dihedral transforms are applied OUTSIDE by
    ``dihedral_batch`` where XLA lowers them to cheap layout copies —
    in-kernel flips would need MXU matmuls (no `rev` in the Mosaic lowering),
    which dominated the step time at 512^2.
    """
    b = digits.shape[0]
    f = data100.shape[0]
    t = tile_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 2, f, t, t),
                               lambda i, digits: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((f, t, t), data100.dtype),
            pltpu.VMEM((f, t, t), data150.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_gather_kernel, t)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 2, f, t, t), data100.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(digits, data100, data150)
