"""SLICS plane painting: batched tiles, on-device blending.

Capability parity with the reference's process_SLICS (process_SLICS.py:128-226)
with the TPU-first restructuring SURVEY §3.3 calls for: instead of painting
overlapping tiles one at a time on CPU, ALL tiles of a shell are extracted,
resampled, painted and blended as device batches:

  extract (periodic gather) -> B-spline zoom -> CVAE decode (batched)
  -> Gaussian-weight blend (scan of dynamic_update_slice scatter-adds)

File IO stays in lightcone/io.py so this module is hermetically testable on
synthetic planes.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from baryon_painter_tpu.lightcone import io as slics_io
from baryon_painter_tpu.lightcone.tiling import (generate_tiling, get_tile,
                                                 make_weight_map,
                                                 tile_origin_pixels)
from baryon_painter_tpu.ops.resample import resize_spline

__all__ = ["paint_plane", "paint_plane_seamless",
           "paint_plane_from_massplane", "process_slics", "blend_tiles"]


@partial(jax.jit, static_argnames=("plane_size",))
def blend_tiles(tiles, weights, origins, plane_size: int):
    """Accumulate sum(w*tile) and sum(w) onto a plane canvas.

    tiles: (N, T, T); weights: (N, T, T); origins: (N, 2) int32 pixel
    origins (tiles never cross the canvas edge by construction of
    generate_tiling). Returns (painted_plane, weight_plane).
    """
    plane0 = jnp.zeros((plane_size, plane_size), tiles.dtype)
    wplane0 = jnp.zeros((plane_size, plane_size), tiles.dtype)

    def body(carry, inp):
        plane, wplane = carry
        tile, w, o = inp
        cur = jax.lax.dynamic_slice(plane, (o[0], o[1]), tile.shape)
        plane = jax.lax.dynamic_update_slice(plane, cur + w * tile,
                                             (o[0], o[1]))
        curw = jax.lax.dynamic_slice(wplane, (o[0], o[1]), tile.shape)
        wplane = jax.lax.dynamic_update_slice(wplane, curw + w, (o[0], o[1]))
        return (plane, wplane), None

    (plane, wplane), _ = jax.lax.scan(body, (plane0, wplane0),
                                      (tiles, weights, origins))
    return plane, wplane


def _extract_tiles_device(plane, origin_pairs_frac, tile_relative_size):
    """Gather (periodic) tiles at native resolution, on device.

    plane: (n, n) jnp array; origin_pairs_frac: sequence of (ox, oy)
    relative origins; returns (len(pairs), n_nat, n_nat). Origins round
    (matching tiling._origin_px) — truncation would misalign extraction vs
    blend placement by one pixel on affected plane sizes."""
    n = plane.shape[0]
    n_nat = int(n * tile_relative_size)
    o = np.rint(np.asarray(origin_pairs_frac) * n).astype(np.int64)  # (k, 2)
    rows = (o[:, 0:1] + np.arange(n_nat)[None, :]) % n  # (k, n_nat)
    cols = (o[:, 1:2] + np.arange(n_nat)[None, :]) % n
    return plane[jnp.asarray(rows)[:, :, None], jnp.asarray(cols)[:, None, :]]


def paint_plane(painter, delta: np.ndarray, z_slice: float,
                tile_size: float, delta_size: float, n_pixel_tile: int,
                min_tile_overlap: float = 0.5,
                falloff: float = 0.05, sigma: float = 0.5,
                paint_batch_size: int = 16,
                zoom_order: int = 3,
                regularise: bool = False,
                regularise_std: Optional[float] = None,
                collect_problematic: bool = False,
                mesh=None,
                device_output: bool = False):
    """Paint one high-z shell: overlap-tile the plane, batch-paint, blend.

    Mirrors the reference's high-z branch (process_SLICS.py:177-220) with
    batched device execution. With ``mesh`` (a 1-D jax.sharding.Mesh) each
    tile batch is sharded over the mesh devices, so the whole
    zoom -> decode -> inverse-transform graph partitions across chips (the
    painter's variables must be replicated over the mesh; process_slics
    does this). Returns the painted plane (+ problem list).
    """
    n_pixel_plane = int(delta_size / tile_size * n_pixel_tile)
    origins, _ = generate_tiling(n_pixel_plane, n_pixel_tile,
                                 min_tile_overlap)
    origin_px = tile_origin_pixels(origins, n_pixel_plane, n_pixel_tile)

    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        # each device must get an equal shard of every painted batch
        n_dev = mesh.size
        paint_batch_size = -(-paint_batch_size // n_dev) * n_dev
        batch_sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))

    # Everything below stays on device until the final blended plane:
    # gather -> B-spline zoom -> batched paint -> weight/regularise -> blend.
    delta_dev = jnp.asarray(delta, jnp.float32)
    frac = tile_size / delta_size
    n_nat = int(delta_dev.shape[0] * frac)
    pairs = [(ox, oy) for ox in origins for oy in origins]
    n_tiles = len(pairs)

    # batched resample native -> model resolution (reference zooms per tile
    # with scipy order 3 'reflect': process_SLICS.py:205). Chunk the
    # native-resolution extraction: the FFT prefilter's intermediates are
    # ~6x the f32 tile, so a near-plane-sized tile batch would transiently
    # need multiple GB of HBM; zoomed (n_pixel_tile^2) outputs are small.
    k_zoom = max(1, min(n_tiles, (1 << 30) // max(1, n_nat * n_nat * 4 * 6)))
    zoomed = []
    for lo in range(0, n_tiles, k_zoom):
        sub = pairs[lo:lo + k_zoom]
        pad = k_zoom - len(sub)
        if pad:  # keep one compiled zoom shape
            sub = sub + [sub[-1]] * pad
        raw = _extract_tiles_device(delta_dev, sub, frac)
        z_chunk = resize_spline(raw, (n_pixel_tile, n_pixel_tile),
                                order=zoom_order, mode="reflect")
        zoomed.append(z_chunk[:k_zoom - pad] if pad else z_chunk)
    tiles = zoomed[0] if len(zoomed) == 1 else jnp.concatenate(zoomed, axis=0)

    chunks = []
    for lo in range(0, n_tiles, paint_batch_size):
        hi = min(lo + paint_batch_size, n_tiles)
        chunk = tiles[lo:hi]
        # pad the last chunk so every call hits the same compiled graph
        pad = paint_batch_size - (hi - lo)
        if pad:
            chunk = jnp.concatenate(
                [chunk, jnp.repeat(chunk[-1:], pad, axis=0)])
        zs = jnp.full(chunk.shape[0], z_slice, jnp.float32)
        if batch_sharding is not None:
            chunk = jax.device_put(chunk, batch_sharding)
            zs = jax.device_put(zs, batch_sharding)
        chunks.append(painter.paint_batch(chunk, zs)[: hi - lo])
    painted = jnp.concatenate(chunks, axis=0)

    w = jnp.asarray(make_weight_map((n_pixel_tile, n_pixel_tile),
                                    falloff=falloff, sigma=sigma),
                    jnp.float32)
    weights = jnp.broadcast_to(w, painted.shape)

    problematic = []
    if regularise_std is not None:
        mean = painted.mean(axis=(1, 2), keepdims=True)
        std = painted.std(axis=(1, 2), keepdims=True)
        outlier = jnp.abs(painted - mean) > std * regularise_std
        if collect_problematic:
            bad = np.asarray(outlier.any(axis=(1, 2)))
            tiles_h = np.asarray(tiles)
            painted_h = np.asarray(painted)
            for i in np.nonzero(bad)[0]:
                problematic.append((z_slice, tiles_h[i], painted_h[i]))
        if regularise:
            weights = jnp.where(outlier, 0.0, weights)

    grid = np.array([(x, y) for x in origin_px for y in origin_px],
                    dtype=np.int32)
    plane, wplane = blend_tiles(painted, weights, jnp.asarray(grid),
                                n_pixel_plane)
    result = plane / wplane
    if not device_output:
        result = np.asarray(result)
    if collect_problematic:
        return result, problematic
    return result


def paint_plane_seamless(painter, delta, z_slice: float,
                         tile_size: float, delta_size: float,
                         n_pixel_tile: int, zoom_order: int = 3,
                         mesh=None, rng=None, z_mode: str = "sample",
                         device_output: bool = False):
    """Paint one high-z shell seam-free: zoom the WHOLE plane to model
    resolution and decode it in one fully-convolutional pass
    (parallel/spatial.paint_plane), optionally row-sharded over a mesh
    with halo exchange.

    The tile-blend path (:func:`paint_plane`) reproduces the reference's
    overlap-tiling (process_SLICS.py:177-220); this one removes its two
    artifacts at the source — no Gaussian-weight seams, and no per-tile
    zoom boundary effects (the plane is resampled once, globally). Compute
    is lower too: overlap >= 0.5 paints every pixel 2-4 times, a seamless
    pass paints it once (plus the halo margin per device).

    Outlier regularisation is tile-based and does not apply here; use the
    tiled path when the reference's regularise flags are needed.
    """
    from baryon_painter_tpu.parallel import spatial

    n_pixel_plane = int(delta_size / tile_size * n_pixel_tile)
    plane = jnp.asarray(delta, jnp.float32)
    if plane.shape != (n_pixel_plane, n_pixel_plane):
        # periodic resampling (ops/resample mode='wrap' == scipy
        # grid-wrap/grid_mode=True): the plane is a slice of a periodic
        # box, and the subsequent spatial paint applies periodic-wrap
        # boundaries at the same edges — reflect would mirror a band of
        # ~spline-support pixels at each edge and then paint it as if
        # periodic
        plane = resize_spline(plane[None],
                              (n_pixel_plane, n_pixel_plane),
                              order=zoom_order, mode="wrap")[0]
    out = spatial.paint_plane(painter, plane, z_slice, mesh=mesh,
                              rng=rng, z_mode=z_mode)
    return out if device_output else np.asarray(out)


def paint_plane_from_massplane(painter, massplane: np.ndarray,
                               shift, z_slice: float,
                               tile_size: float, delta_size: float,
                               n_pixel_tile: int,
                               massplane_size: float = slics_io.MASSPLANE_SIZE,
                               subtract_minimum: bool = False,
                               zoom_order: int = 3,
                               pre_extracted: bool = False,
                               device_output: bool = False):
    """Low-z branch: the tile is bigger than the delta plane
    (process_SLICS.py:150-176). Extract an expanded tile from the mass
    plane, paint it, crop back to the delta footprint.

    ``pre_extracted=True``: ``massplane`` already IS the expanded tile
    (host-side crop before upload — process_slics extracts the
    ``tile_size/massplane_size`` window from the raw 12288^2 plane on the
    host so only ~(tile_size/505)^2 of the 600 MB plane crosses the
    host->device link; bit-identical values, same wrap arithmetic)."""
    if pre_extracted:
        tile = massplane
    else:
        tile = get_tile(massplane, shift,
                        tile_relative_size=delta_size / massplane_size,
                        expansion_factor=tile_size / delta_size)
    if subtract_minimum:
        tile = tile - tile.min()
    tile = resize_spline(jnp.asarray(tile[None], jnp.float32),
                         (n_pixel_tile, n_pixel_tile),
                         order=zoom_order, mode="mirror")
    painted = painter.paint_batch(tile, jnp.full(1, z_slice, jnp.float32))[0]
    frac = delta_size / tile_size
    out = get_tile(painted, ((1 - frac) / 2, (1 - frac) / 2),
                   tile_relative_size=frac)
    return out if device_output else np.asarray(out)


def process_slics(painter, tile_size: float, n_pixel_tile: int,
                  LOS: int, z_SLICS: Sequence[float],
                  delta_size: Sequence[float],
                  delta_path: str, massplane_path: str, shifts_path: str,
                  z_slice: Sequence[float],
                  min_tiling_overlap: float = 0.5,
                  verbose: bool = True,
                  SLICS_density: bool = False,
                  regularise: bool = False,
                  regularise_std: Optional[float] = None,
                  return_problematic_tiles: bool = False,
                  paint_batch_size: int = 16,
                  n_pixel_delta: int = slics_io.N_PIXEL_DELTA,
                  n_pixel_massplane: int = slics_io.N_PIXEL_MASSPLANE,
                  massplane_size: float = slics_io.MASSPLANE_SIZE,
                  mesh=None,
                  transfer_dtype=None,
                  seamless: bool = False,
                  device_output: bool = False,
                  ) -> List[np.ndarray]:
    """Full multi-shell pipeline; reference call contract
    (process_SLICS.py:128-226).

    TPU scaling knobs the reference lacks:
      * ``mesh``: a 1-D jax.sharding.Mesh; every shell's tile batch is
        sharded over its devices (the painter's variables are replicated
        here once). One v5e-8 slice paints ~8x the tiles per dispatch.
      * ``transfer_dtype``: e.g. jnp.bfloat16 halves the host->device bytes
        of the 240 MB delta planes (the dominant cost behind a
        network-attached chip); planes are promoted back to float32 on
        device before painting.
      * ``seamless``: paint each high-z shell as ONE fully-convolutional
        pass over the whole zoomed plane (halo-exchange sharded when a
        mesh is given) instead of overlap-tiling + weight blending — see
        :func:`paint_plane_seamless`. Incompatible with the tile-based
        regularise/return_problematic_tiles options.
      * ``device_output``: return the painted planes as device arrays
        instead of numpy. Feeding them straight into ``create_y_map``
        (which computes on device) skips a full D2H + H2D round trip of
        every painted plane (~0.5 GB/LOS over a network-attached chip).
    """
    if seamless and (regularise or return_problematic_tiles):
        raise ValueError("seamless painting has no tiles to regularise; "
                         "use the tiled path for regularise/"
                         "return_problematic_tiles")
    if seamless and getattr(painter, "_fused_inference", False):
        # The fused Pallas blocks specialize on spatial shape; seamless
        # paints a distinct plane size per shell, each a separate Mosaic
        # compile. Measured close-out (docs/ab/seamless_roofline_r5.json):
        # whole-plane XLA painting runs at 66.6% of peak HBM BW, and the
        # production LOS is TRANSFER-bound (paint 1.44 s vs H2D 3.81 s
        # per shell, 66% overlap), so a fused seamless variant buys <10%
        # end-to-end — tile-batch-only is a design decision, not a gap.
        raise ValueError("seamless painting with fused_inference recompiles "
                         "the fused kernels per plane size; use fused for "
                         "the tiled path only (measured rationale: "
                         "docs/ab/seamless_roofline_r5.json)")
    if len(z_SLICS) != len(z_slice):
        raise ValueError("Shapes of z_SLICS and z_slice need to match!")

    if mesh is not None and hasattr(painter, "variables"):
        from baryon_painter_tpu.parallel.mesh import replicate
        painter.variables = replicate(painter.variables, mesh)

    # Per-shell work is ~0.5 s of device compute behind several seconds of
    # disk read + host->device transfer, so IO for shell i+1 is prefetched on
    # a worker thread (including the async device_put) while shell i paints.
    # The raw file bytes go to the device untransposed/unscaled; transpose
    # and normalisation happen on device.
    from concurrent.futures import ThreadPoolExecutor

    @jax.jit
    def _prep_delta(raw):
        return (raw.T.astype(jnp.float32) + 96.0) * slics_io.SLICS_NORM

    @jax.jit
    def _prep_massplane_tile(raw):
        return raw.astype(jnp.float32) * slics_io.SLICS_NORM

    def to_device(raw):
        if transfer_dtype is not None:
            raw = raw.astype(transfer_dtype)  # halve H2D bytes (bf16)
        return jnp.asarray(raw)

    shifts_box = [None]  # parsed once, by the (single) IO worker

    def load_shell(i):
        z_shell = z_SLICS[i]
        if delta_size[i] < tile_size:
            mp_file = slics_io.massplane_filename(massplane_path, z_shell,
                                                  LOS, i)
            raw = slics_io.load_massplane_raw(mp_file, n_pixel_massplane)
            if shifts_box[0] is None:
                shifts_box[0] = slics_io.load_random_shifts(shifts_path, LOS)
            # Host-side crop BEFORE upload: only the expanded paint tile
            # (~(tile_size/505)^2 of the 600 MB plane) crosses the link —
            # same get_tile wrap arithmetic, bit-identical tile values.
            # raw is the on-disk layout; .T is a view, np.ix_ gathers the
            # tile as a small contiguous copy.
            tile = get_tile(raw.T, shifts_box[0][i],
                            tile_relative_size=delta_size[i] / massplane_size,
                            expansion_factor=tile_size / delta_size[i])
            return "massplane", _prep_massplane_tile(to_device(tile))
        if SLICS_density:
            plane = slics_io.load_density_fits(
                slics_io.density_filename(delta_path, z_shell, LOS))
            return "delta", jnp.asarray(plane)
        raw = slics_io.load_delta_plane_raw(
            slics_io.delta_filename(delta_path, z_shell, LOS), n_pixel_delta)
        return "delta", _prep_delta(to_device(raw))

    painted_planes = []
    problematic = []
    with ThreadPoolExecutor(max_workers=1) as pool:
        future = pool.submit(load_shell, 0)
        for i, z_shell in enumerate(z_SLICS):
            if verbose:
                print(f"Processing z={z_shell:.3f}")
            kind, plane = future.result()
            if i + 1 < len(z_SLICS):
                future = pool.submit(load_shell, i + 1)
            if kind == "massplane":
                painted_planes.append(paint_plane_from_massplane(
                    painter, plane, None, z_slice[i],
                    tile_size, delta_size[i], n_pixel_tile,
                    massplane_size=massplane_size,
                    subtract_minimum=SLICS_density,
                    pre_extracted=True, device_output=device_output))
            elif seamless:
                painted_planes.append(paint_plane_seamless(
                    painter, plane, z_slice[i], tile_size, delta_size[i],
                    n_pixel_tile, mesh=mesh,
                    rng=jax.random.PRNGKey(1000 * LOS + i),
                    device_output=device_output))
            else:
                out = paint_plane(painter, plane, z_slice[i], tile_size,
                                  delta_size[i], n_pixel_tile,
                                  min_tile_overlap=min_tiling_overlap,
                                  paint_batch_size=paint_batch_size,
                                  regularise=regularise,
                                  regularise_std=regularise_std,
                                  collect_problematic=return_problematic_tiles,
                                  mesh=mesh, device_output=device_output)
                if return_problematic_tiles:
                    out, probs = out
                    problematic.extend(probs)
                painted_planes.append(out)

    if return_problematic_tiles:
        return painted_planes, problematic
    return painted_planes
