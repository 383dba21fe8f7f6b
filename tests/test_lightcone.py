"""Lightcone pipeline tests: tiling geometry, blending, y-map physics."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.cosmology import SLICS_COSMOLOGY
from baryon_painter_tpu.lightcone.io import SLICS_NORM
from baryon_painter_tpu.lightcone.pipeline import (blend_tiles, paint_plane,
                                                   paint_plane_from_massplane,
                                                   process_slics)
from baryon_painter_tpu.lightcone.tiling import (generate_tiling, get_tile,
                                                 make_weight_map)
from baryon_painter_tpu.lightcone.ymap import (create_y_map,
                                               effective_pixel_areas)


class StubPainter:
    """Identity painter: isolates pipeline geometry from model behavior."""

    def __init__(self, fn=lambda x: x):
        self.fn = fn

    def paint_batch(self, tiles, zs, **kw):
        return jnp.asarray(self.fn(np.asarray(tiles)))


# --------------------------------------------------------------------- #
# Tiling geometry (mirrors reference tests/test_SLICS_tiling.py:72-92)
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("plane,tile,overlap,want", [
    (512, 256, 0.0, 2),
    (512, 250, 0.0, 3),
    (512, 256, 0.5, 3),
    (512, 128, 0.0, 4),
    (512, 32, 0.33, 24),
])
def test_generate_tiling_counts(plane, tile, overlap, want):
    origins, tiles = generate_tiling(plane, tile, min_tile_overlap=overlap)
    assert len(origins) == want
    assert len(tiles) == want and len(tiles[0]) == want


def test_generate_tiling_full_coverage():
    _, tiles = generate_tiling(512, 32, min_tile_overlap=0.33)
    w = np.zeros((512, 512))
    for row in tiles:
        for s in row:
            w[s] += 1
    assert w.min() >= 1  # every pixel covered


def test_generate_tiling_overlap_guarantee():
    origins, _ = generate_tiling(1000, 300, min_tile_overlap=0.4)
    px = (origins * 1000).astype(int)
    gaps = np.diff(px)
    assert np.all(gaps <= 300 * (1 - 0.4) + 1)


def test_get_tile_wrap(rng):
    m = rng.standard_normal((16, 16)).astype(np.float32)
    t = get_tile(m, (0.75, 0.75), 0.5)
    assert t.shape == (8, 8)
    np.testing.assert_array_equal(t[:4, :4], m[12:, 12:])
    np.testing.assert_array_equal(t[4:, 4:], m[:4, :4])  # wrapped corner


def test_get_tile_expansion(rng):
    m = rng.standard_normal((16, 16)).astype(np.float32)
    t = get_tile(m, (0.0, 0.0), 0.5, expansion_factor=1.5)
    assert t.shape == (12, 12)
    np.testing.assert_array_equal(t[2:10, 2:10], m[:8, :8])
    with pytest.raises(ValueError):
        get_tile(m, (0, 0), 0.5, expansion_factor=0.5)


def test_weight_map_profile():
    w = make_weight_map((64, 64), falloff=0.1, sigma=0.5)
    assert w.shape == (64, 64)
    assert w[32, 32] == 1.0
    assert w[0, 32] < 1.0 and w[32, 0] < 1.0
    # corner = product of edge factors
    np.testing.assert_allclose(w[0, 0], w[0, 32] * w[32, 0], rtol=1e-10)
    # symmetric
    np.testing.assert_allclose(w, w[::-1], rtol=1e-12)
    np.testing.assert_allclose(w, w.T, rtol=1e-12)


# --------------------------------------------------------------------- #
# Blending + plane painting
# --------------------------------------------------------------------- #

def test_blend_tiles_exact():
    tiles = jnp.ones((4, 8, 8)) * jnp.arange(1, 5)[:, None, None]
    weights = jnp.ones((4, 8, 8)) * 0.5
    origins = jnp.array([[0, 0], [0, 8], [8, 0], [4, 4]], jnp.int32)
    plane, wplane = blend_tiles(tiles, weights, origins, 16)
    np.testing.assert_allclose(np.asarray(plane)[0, 0], 0.5)
    np.testing.assert_allclose(np.asarray(wplane)[6, 6], 1.0)  # overlap 1+4
    np.testing.assert_allclose(np.asarray(plane)[6, 6], 0.5 * 1 + 0.5 * 4)


def test_tiling_covers_every_pixel_for_all_plane_sizes():
    """Truncating tile origins (int instead of round) used to drop the last
    origin by one pixel for ~13% of plane sizes (e.g. N=514 at T=512,
    overlap 0.2), leaving a 1-px strip covered by no tile — a NaN strip
    after blend normalization. Every pixel must be covered, and the slice
    origins must equal the blend-placement origins."""
    from baryon_painter_tpu.lightcone.tiling import tile_origin_pixels
    for N in [514, 517, 1198, 2534] + list(range(513, 1200, 7)):
        origins, slices = generate_tiling(N, 512, min_tile_overlap=0.2)
        px = tile_origin_pixels(origins, N, 512)
        cov = np.zeros(N, bool)
        for x0 in px:
            assert 0 <= x0 <= N - 512, (N, x0)
            cov[x0:x0 + 512] = True
        assert cov.all(), f"uncovered pixels at N={N}"
        # slices and blend placement share the same origin arithmetic
        assert [s[0].start for s in (row[0] for row in slices)] == list(px)


def test_generate_tiling_rejects_degenerate_overlap():
    with pytest.raises(ValueError):
        generate_tiling(1024, 512, min_tile_overlap=1.0)
    with pytest.raises(ValueError):
        generate_tiling(1024, 512, min_tile_overlap=-0.1)


def test_paint_plane_identity_reconstructs(rng):
    """With an identity painter and delta at canvas resolution, the blended
    output must equal the input plane (weights cancel exactly)."""
    delta = rng.standard_normal((256, 256)).astype(np.float32)
    out = paint_plane(StubPainter(), delta, z_slice=0.5, tile_size=100.0,
                      delta_size=400.0, n_pixel_tile=64,
                      min_tile_overlap=0.5, zoom_order=1)
    assert out.shape == (256, 256)
    np.testing.assert_allclose(out, delta, rtol=1e-4, atol=1e-5)


def test_paint_plane_regularise(rng):
    delta = rng.standard_normal((128, 128)).astype(np.float32)

    def spike(x):
        x = x.copy()
        x[:, 0, 0] += 1000.0  # inject an outlier in every tile
        return x

    out, probs = paint_plane(StubPainter(spike), delta, z_slice=0.0,
                             tile_size=100.0, delta_size=200.0,
                             n_pixel_tile=64, zoom_order=1,
                             regularise=True, regularise_std=5.0,
                             collect_problematic=True)
    assert len(probs) > 0
    assert all(p[0] == 0.0 for p in probs)
    # regularisation zeroes outlier weights; only pixels where EVERY
    # overlapping tile was zeroed may be NaN (the injected spike hits one
    # corner pixel per tile), so the plane must stay almost fully finite
    assert np.isfinite(out).mean() > 0.95


def test_paint_plane_from_massplane(rng):
    mp = rng.standard_normal((300, 300)).astype(np.float32)
    out = paint_plane_from_massplane(
        StubPainter(), mp, shift=(0.3, 0.6), z_slice=0.04,
        tile_size=100.0, delta_size=50.0, n_pixel_tile=64,
        massplane_size=505.0, zoom_order=1)
    # crop footprint is delta_size/tile_size of the painted tile
    assert out.shape == (32, 32)
    assert np.all(np.isfinite(out))


@pytest.mark.slow
def test_process_slics_end_to_end(tmp_path, rng):
    """Synthetic LOS with one low-z (massplane) and one high-z (delta) shell."""
    n_delta, n_mass = 128, 96
    delta_path = tmp_path / "delta"
    mass_path = tmp_path / "massplanes"
    shifts_path = tmp_path / "shifts"
    for p in (delta_path, mass_path, shifts_path):
        os.makedirs(p)
    z_shells = [0.042, 0.500]
    # low-z shell -> massplane file (leading count value then data)
    mp = rng.standard_normal(n_mass * n_mass + 1).astype(np.float32)
    mp.tofile(mass_path / f"{z_shells[0]:.3f}proj_half_finer_xy.dat_LOS7")
    # high-z shell -> delta file
    d = rng.standard_normal(n_delta * n_delta).astype(np.float32)
    d.tofile(delta_path / f"{z_shells[1]:.3f}delta.dat_bicubic_LOS7")
    np.savetxt(shifts_path / "random_shift_LOS7",
               np.array([[0.2, 0.3], [0.5, 0.6]]))

    planes = process_slics(
        StubPainter(), tile_size=100.0, n_pixel_tile=64, LOS=7,
        z_SLICS=z_shells, delta_size=np.array([60.0, 250.0]),
        delta_path=str(delta_path), massplane_path=str(mass_path),
        shifts_path=str(shifts_path), z_slice=[0.02, 0.45],
        verbose=False, n_pixel_delta=n_delta, n_pixel_massplane=n_mass,
        massplane_size=505.0)
    assert len(planes) == 2
    # low-z plane footprint: delta_size/tile_size * n_pixel_tile
    assert planes[0].shape == (38, 38)
    assert planes[1].shape == (160, 160)
    assert all(np.all(np.isfinite(p)) for p in planes)
    with pytest.raises(ValueError):
        process_slics(StubPainter(), 100.0, 64, 7, z_shells, [1.0, 2.0],
                      "", "", "", z_slice=[0.0])


def test_massplane_host_crop_matches_full_plane(rng):
    """process_slics crops the massplane on the HOST before upload; the
    painted plane must be bit-identical to the old extract-on-device path
    (same get_tile wrap arithmetic, NORM applied after the crop)."""
    from baryon_painter_tpu.lightcone import io as slics_io
    from baryon_painter_tpu.lightcone.tiling import get_tile

    raw = rng.standard_normal((96, 96)).astype(np.float32)  # disk layout
    shift, delta_size, tile_size, mp_size = (0.37, 0.81), 60.0, 100.0, 505.0
    # old path: full plane -> device-style prep -> get_tile on the plane
    full = raw.T.astype(np.float32) * slics_io.SLICS_NORM
    old = paint_plane_from_massplane(
        StubPainter(), full, shift, z_slice=0.04, tile_size=tile_size,
        delta_size=delta_size, n_pixel_tile=64, massplane_size=mp_size,
        zoom_order=1)
    # new path: host crop of the raw layout, NORM after
    tile = get_tile(raw.T, shift, tile_relative_size=delta_size / mp_size,
                    expansion_factor=tile_size / delta_size)
    new = paint_plane_from_massplane(
        StubPainter(), tile.astype(np.float32) * slics_io.SLICS_NORM, None,
        z_slice=0.04, tile_size=tile_size, delta_size=delta_size,
        n_pixel_tile=64, massplane_size=mp_size, zoom_order=1,
        pre_extracted=True)
    np.testing.assert_array_equal(old, new)


def test_paint_plane_device_output_matches(rng):
    """device_output=True returns the same values as the numpy path (it
    only skips the host conversion)."""
    import jax

    delta = rng.standard_normal((80, 80)).astype(np.float32)
    kw = dict(z_slice=0.5, tile_size=100.0, delta_size=125.0,
              n_pixel_tile=64, min_tile_overlap=0.5, zoom_order=1)
    a = paint_plane(StubPainter(), delta, **kw)
    b = paint_plane(StubPainter(), delta, device_output=True, **kw)
    assert isinstance(a, np.ndarray)
    assert isinstance(b, jax.Array)
    np.testing.assert_array_equal(a, np.asarray(b))


# --------------------------------------------------------------------- #
# y-map assembly
# --------------------------------------------------------------------- #

@pytest.mark.slow
def test_effective_pixel_areas_against_quad():
    from scipy.integrate import quad
    cosmo = SLICS_COSMOLOGY()
    z = np.array([0.042, 0.130, 0.221, 0.317, 0.418])
    theta = 10.0 / 512 * np.pi / 180
    areas = effective_pixel_areas(cosmo, z, theta)

    h = cosmo.h
    d_A = cosmo.comoving_angular_distance(z) - 252.5 / h / 2
    d_A[0] = max(d_A[0], 0)
    d_A = np.append(d_A, d_A[-1] + 252.5 / h)
    for i in range(len(z)):
        f = lambda chi: (chi * cosmo.scale_factor_of_chi(chi) * theta) ** 2
        want = quad(f, d_A[i], d_A[i + 1], limit=200)[0] / (d_A[i + 1] - d_A[i])
        np.testing.assert_allclose(areas[i], want, rtol=1e-4)


def test_create_y_map_constant_planes():
    cosmo = SLICS_COSMOLOGY()
    z = [0.042, 0.130]
    planes = [np.ones((64, 64), np.float32), np.ones((80, 80), np.float32)]
    y = create_y_map(planes, z, resolution=32, map_size=10.0, cosmo=cosmo,
                     order=1)
    assert y.shape == (32, 32)
    # constant input -> constant output, equal to the sum of per-shell factors
    from baryon_painter_tpu.utils import constants as const
    theta = 10.0 / 32 * np.pi / 180
    A = effective_pixel_areas(cosmo, z, theta)
    y_fac = const.Y_FAC_SI * const.EV * const.MPC ** -2
    V_c = (400.0 / cosmo.h / 2048 * const.MPC / const.CM) ** 3
    want = sum(V_c * (const.XE + const.XI) / const.XE * y_fac / A[i]
               / (32 / planes[i].shape[0]) ** 2 for i in range(2))
    np.testing.assert_allclose(y, want, rtol=1e-3)


def test_create_y_map_handles_nans():
    cosmo = SLICS_COSMOLOGY()
    p = np.ones((32, 32), np.float32)
    p[0, 0] = np.nan
    y = create_y_map([p], [0.2], resolution=32, map_size=10.0, cosmo=cosmo)
    assert np.all(np.isfinite(y))
    with pytest.raises(ValueError):
        create_y_map([p], [0.2, 0.3], 32, 10.0, cosmo)


# --------------------------------------------------------------------- #
# Multi-chip painting (VERDICT r1 item 4): sharded == single-device
# --------------------------------------------------------------------- #

@pytest.mark.slow
def test_process_slics_sharded_matches_single_device(tmp_path, rng):
    """A multi-shell synthetic LOS painted with an 8-device mesh (real CVAE
    painter, tile batches sharded over the mesh, bf16 plane transfer off)
    must equal the single-device result."""
    import jax

    from baryon_painter_tpu.data.dataset import (BahamasTileDataset,
                                                 load_file_info)
    from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
    from baryon_painter_tpu.models.cvae import (CVAE,
                                                fiducial_cvae_architecture)
    from baryon_painter_tpu.painter import CVAEPainter
    from baryon_painter_tpu.parallel.mesh import data_parallel_mesh
    from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
    from baryon_painter_tpu.transforms import RangeCompress

    root = str(tmp_path / "stacks")
    info = make_synthetic_stacks(root, n_stack=2, n_grid=64,
                                 redshifts=(0.0, 1.0))
    ds = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    tr = CVAETrainer(CVAE(fiducial_cvae_architecture(tile_size=32,
                                                     n_res_blocks=1)),
                     ds, config=TrainConfig(seed=0))
    tr.step(ds.get_raw_batch(np.arange(2)), lr=1e-3)

    n_delta = 128
    delta_path, shifts_path = tmp_path / "delta", tmp_path / "shifts"
    os.makedirs(delta_path), os.makedirs(shifts_path)
    z_shells = [0.5, 1.0]
    for z in z_shells:
        d = rng.standard_normal(n_delta * n_delta).astype(np.float32)
        d.tofile(delta_path / f"{z:.3f}delta.dat_bicubic_LOS3")

    def run(mesh, painter, **kw):
        # NOTE chunk sizes (and so the folded paint rngs) differ between the
        # runs; the prior-sample contribution is ~1e-7 of the output for this
        # 1-step model (verified), so the comparison tests the sharded
        # transform->decode->inverse pipeline, not rng bookkeeping.
        return process_slics(
            painter, tile_size=100.0, n_pixel_tile=32, LOS=3,
            z_SLICS=z_shells, delta_size=np.array([200.0, 250.0]),
            delta_path=str(delta_path), massplane_path="", shifts_path="",
            z_slice=[0.45, 0.9], verbose=False, n_pixel_delta=n_delta,
            paint_batch_size=4, mesh=mesh, **kw)

    planes_single = run(None, CVAEPainter.from_trainer(tr, seed=0))
    mesh = data_parallel_mesh(8)
    planes_sharded = run(mesh, CVAEPainter.from_trainer(tr, seed=0))

    assert len(planes_single) == len(planes_sharded) == 2
    for a, b in zip(planes_single, planes_sharded):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-5)

    # bf16 plane transfer: same pipeline, tolerance at bf16 resolution
    planes_bf16 = run(mesh, CVAEPainter.from_trainer(tr, seed=0),
                      transfer_dtype=jax.numpy.bfloat16)
    for a, b in zip(planes_single, planes_bf16):
        np.testing.assert_allclose(b, a, rtol=0.15, atol=0.15 * np.abs(a).max())
