"""Spatially-sharded seam-free plane painting (parallel/spatial.py).

The reference paints big planes as overlapping tiles blended with weight
maps (process_SLICS.py:196-220); the TPU-native path paints the whole
plane at once, row-sharded over a mesh with ppermute halo exchange. These
tests pin the two invariants that make that exact:

  * halo sufficiency — the receptive-field bound from the spec walk is
    large enough that doubling it does not change the painted plane;
  * shard transparency — an 8-device sharded paint equals the unsharded
    one everywhere (same global latent noise), for CVAE and CGAN.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.data.dataset import BahamasTileDataset, load_file_info
from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
from baryon_painter_tpu.models import dsl
from baryon_painter_tpu.models.cvae import CVAE, fiducial_cvae_architecture
from baryon_painter_tpu.painter import CGANPainter, CVAEPainter
from baryon_painter_tpu.parallel.mesh import data_parallel_mesh
from baryon_painter_tpu.parallel.spatial import (latent_downsample,
                                                 paint_plane, required_halo,
                                                 spec_receptive_margin)
from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
from baryon_painter_tpu.transforms import RangeCompress

TILE = 64

# quick-tier exclusion: multi-device paints compile several shard_map
# graphs (run with the full suite, like test_sharded_paint.py)
pytestmark = pytest.mark.slow


def mini_cvae_arch(tile=TILE):
    """A small fully-conv CVAE (latent grid /4) so halos stay test-sized;
    same DSL keys as the fiducial (models/cvae.py)."""
    dim_z = (1, tile // 4, tile // 4)
    return {
        "type": "Type-1",
        "dim_x": (1, tile, tile),
        "dim_y": (1, tile, tile),
        "dim_z": dim_z,
        "n_x_features": 1,
        "aux_label": True,
        "prior_z_y": (dsl.conv_down(2, [8, 16], [2, 2])
                      + dsl.conv_block(16, 2, kernel=3)),
        "q_x_in": dsl.conv_down(1, [8, 16], [2, 2]),
        "q_y_in": dsl.conv_down(2, [8, 16], [2, 2]),
        "q_x_y_out": dsl.conv_block(32, 2, kernel=3),
        "p_y_in": None,
        "p_z_in": dsl.conv_up(1, [1, 1], [2, 2]),
        "p_y_z_in": (dsl.conv_block(3, 8, kernel=3)
                     + dsl.conv_down(8, [16], [2])
                     + [("residual block", dsl.res_block(16))]
                     + dsl.conv_up(16, [8], [2])),
        "p_y_z_out": (dsl.conv_block(8, 1, kernel=3, batchnorm=False,
                                     activation="softplus"),),
        "min_x_var": 1e-7,
        "min_z_var": 1e-7,
        "L": 1,
    }


@pytest.fixture(scope="module")
def painter(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stacks"))
    info = make_synthetic_stacks(root, n_stack=2, n_grid=2 * TILE,
                                 redshifts=(0.0, 1.0))
    ds = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    arch = mini_cvae_arch()
    tr = CVAETrainer(CVAE(arch), ds, config=TrainConfig(seed=0))
    tr.step(ds.get_raw_batch(np.arange(2)), lr=1e-3)
    return CVAEPainter.from_trainer(tr), ds


def _plane(ds, rows=288, cols=96, seed=3):
    rng = np.random.default_rng(seed)
    # in-distribution amplitudes: tile the dataset's own DM field
    base = ds.get_input_sample(5, transform=False)
    reps = (rows + TILE - 1) // TILE, (cols + TILE - 1) // TILE
    plane = np.tile(base, reps)[:rows, :cols]
    return plane * (1 + 0.05 * rng.standard_normal(plane.shape))


# --------------------------------------------------------------------- #


def test_margin_walk_fiducial():
    arch = fiducial_cvae_architecture(tile_size=512, n_res_blocks=4)
    assert latent_downsample(arch) == 32
    h = required_halo(arch, "cvae")
    assert h % 32 == 0 and 128 <= h <= 1024
    # resize decoder has a smaller upsampling footprint
    arch_r = fiducial_cvae_architecture(tile_size=512, n_res_blocks=4,
                                        upsample="resize")
    assert required_halo(arch_r, "cvae") <= h


def test_margin_walk_rejects_non_conv():
    with pytest.raises(ValueError, match="linear"):
        spec_receptive_margin((("linear", {"out_features": 4}),))


def test_margin_walk_even_kernel_asymmetry():
    """Even-kernel strided convs reach max(p, k-1-p) = 5 for (k=8, p=2),
    not k//2 = 4 — the DSL's scale-4 convs are asymmetric."""
    m, f = spec_receptive_margin(dsl.conv_block(1, 8, scale=4))
    assert f == 4 and m == 5
    m2, f2 = spec_receptive_margin(dsl.conv_block(1, 8, scale=2))
    assert f2 == 2 and m2 == 2  # k=4, p=1: max(1, 2) = 2


def test_required_halo_counts_p_y_in_branch():
    """A convolutional p_y_in (first-class DSL key) must widen the halo
    when its reach exceeds the prior+p_z_in branch."""
    arch = mini_cvae_arch()
    h0 = required_halo(arch, "cvae")
    wide = dict(arch)
    # huge direct-y branch: reach 60 >> the z branch's
    wide["p_y_in"] = dsl.conv_block(1, 1, kernel=121, batchnorm=False,
                                    activation=None)
    assert required_halo(wide, "cvae") > h0


def test_halo_sufficiency(painter):
    """Doubling the computed halo must not change the painted plane —
    i.e. the receptive-field bound really covers the network."""
    p, ds = painter
    arch = p.architecture
    h = required_halo(arch, "cvae")
    plane = _plane(ds, rows=160, cols=96)
    rng = jax.random.PRNGKey(7)
    a = np.asarray(paint_plane(p, plane, z=0.5, halo=h, rng=rng))
    b = np.asarray(paint_plane(p, plane, z=0.5, halo=2 * h, rng=rng))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_sharded_equals_unsharded_sample(painter):
    p, ds = painter
    plane = _plane(ds, rows=288, cols=96)
    rng = jax.random.PRNGKey(11)
    plain = np.asarray(paint_plane(p, plane, z=1.0, rng=rng))
    mesh = data_parallel_mesh(8, axis_name="sp")
    sharded = paint_plane(p, plane, z=1.0, mesh=mesh, rng=rng)
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sharded), plain, rtol=1e-5,
                               atol=1e-6)
    assert np.all(np.isfinite(plain))


def test_sharded_equals_unsharded_mean_mode(painter):
    p, ds = painter
    plane = _plane(ds, rows=288, cols=96, seed=5)
    plain = np.asarray(paint_plane(p, plane, z=0.0, z_mode="mean"))
    mesh = data_parallel_mesh(4, axis_name="sp")
    sharded = paint_plane(p, plane, z=0.0, z_mode="mean", mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded), plain, rtol=1e-5,
                               atol=1e-6)


def test_non_multiple_plane_sharded_equals_unsharded(painter):
    """Plane sizes that don't divide into n aligned slabs take the
    gathered-overlap path; the boundary period Q = round_up(H, f) is
    device-count independent, so sharded == unsharded EXACTLY even here
    (the production SLICS shells are this case: 2585 px at model
    resolution)."""
    p, ds = painter
    plane = _plane(ds, rows=150, cols=91)
    rng = jax.random.PRNGKey(0)
    plain = np.asarray(paint_plane(p, plane, z=0.5, rng=rng))
    for n_dev in (2, 8):
        mesh = data_parallel_mesh(n_dev, axis_name="sp")
        out = paint_plane(p, plane, z=0.5, mesh=mesh, rng=rng)
        assert out.shape == (150, 91)
        np.testing.assert_allclose(np.asarray(out), plain, rtol=1e-5,
                                   atol=1e-6)


def test_halo_exceeding_slab_uses_gathered_path(painter):
    """A halo larger than the per-device slab cannot ride the one-hop
    ppermute ring; the gathered path handles it (and stays equal to the
    unsharded paint)."""
    p, ds = painter
    plane = _plane(ds, rows=96, cols=96)
    rng = jax.random.PRNGKey(0)
    plain = np.asarray(paint_plane(p, plane, z=0.5, halo=64, rng=rng))
    mesh = data_parallel_mesh(8, axis_name="sp")
    out = paint_plane(p, plane, z=0.5, mesh=mesh, halo=64, rng=rng)
    np.testing.assert_allclose(np.asarray(out), plain, rtol=1e-5,
                               atol=1e-6)


def test_cgan_plane_paint(tmp_path):
    from baryon_painter_tpu.models.cgan import (CGANDiscriminator,
                                                CGANGenerator)
    from baryon_painter_tpu.train.cgan import CGANTrainer, CGANTrainConfig
    root = str(tmp_path / "stacks")
    info = make_synthetic_stacks(root, n_stack=2, n_grid=2 * TILE,
                                 redshifts=(0.0, 1.0))
    ds = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    tr = CGANTrainer(ds, config=CGANTrainConfig(seed=0),
                     generator=CGANGenerator(n_res_blocks=2,
                                             spectral_norm=False),
                     discriminator=CGANDiscriminator(spectral_norm=False))
    tr.step(ds.get_raw_batch(np.arange(2)), lr=5e-5)
    p = CGANPainter.from_trainer(tr)

    arch = p.meta["model_architecture"]
    assert latent_downsample(arch) == 4
    h = required_halo(arch, "cgan")
    assert h % 4 == 0 and h > 0

    plane = _plane(ds, rows=160, cols=96, seed=9)
    plain = np.asarray(paint_plane(p, plane, z=1.0))
    # halo sufficiency for the CGAN walk too
    big = np.asarray(paint_plane(p, plane, z=1.0, halo=2 * h))
    np.testing.assert_allclose(plain, big, rtol=1e-5, atol=1e-6)
    mesh = data_parallel_mesh(4, axis_name="sp")
    sharded = paint_plane(p, plane, z=1.0, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded), plain, rtol=1e-5,
                               atol=1e-6)


def test_pipeline_seamless_shell(painter, tmp_path):
    """process_slics(seamless=True) paints a high-z shell as one
    fully-convolutional pass: shape, finiteness, and equality with a
    direct spatial paint of the same zoomed plane."""
    import os

    from baryon_painter_tpu.lightcone.pipeline import (paint_plane_seamless,
                                                       process_slics)
    from baryon_painter_tpu.ops.resample import resize_spline

    p, ds = painter
    rng = np.random.default_rng(1)
    n_delta = 128
    delta_path = tmp_path / "delta"
    shifts_path = tmp_path / "shifts"
    os.makedirs(delta_path)
    os.makedirs(shifts_path)
    z_shells = [0.500]
    d = np.abs(rng.standard_normal(n_delta * n_delta)).astype(np.float32)
    d.tofile(delta_path / f"{z_shells[0]:.3f}delta.dat_bicubic_LOS7")

    planes = process_slics(
        p, tile_size=100.0, n_pixel_tile=TILE, LOS=7,
        z_SLICS=z_shells, delta_size=np.array([250.0]),
        delta_path=str(delta_path), massplane_path="", shifts_path="",
        z_slice=[0.45], verbose=False, n_pixel_delta=n_delta,
        seamless=True)
    n_plane = int(250.0 / 100.0 * TILE)
    assert planes[0].shape == (n_plane, n_plane)
    assert np.all(np.isfinite(planes[0]))

    # the pipeline wrapper == zoom once + spatial paint with the same key
    raw = np.fromfile(delta_path / f"{z_shells[0]:.3f}delta.dat_bicubic_"
                      "LOS7", dtype=np.float32).reshape(n_delta, n_delta)
    prep = (raw.T.astype(np.float32) + 96.0) * (12288.0 ** 2 / (3072.0 ** 3 / 2))
    direct = paint_plane_seamless(p, prep, 0.45, 100.0, 250.0, TILE,
                                  rng=jax.random.PRNGKey(1000 * 7 + 0))
    np.testing.assert_allclose(planes[0], direct, rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="seamless"):
        process_slics(p, 100.0, TILE, 7, z_shells, np.array([250.0]),
                      str(delta_path), "", "", z_slice=[0.45],
                      verbose=False, n_pixel_delta=n_delta,
                      seamless=True, regularise=True)


def test_calibrate_halo(painter):
    """The empirical halo is <= the analytic bound, aligned, and painting
    with it matches the analytic-bound paint on a fresh plane."""
    from baryon_painter_tpu.parallel.spatial import calibrate_halo

    p, ds = painter
    h_ref = required_halo(p.architecture, "cvae")
    h_cal = calibrate_halo(p, z=0.5)
    f = latent_downsample(p.architecture)
    assert h_cal % f == 0 and 0 < h_cal <= h_ref

    plane = _plane(ds, rows=160, cols=96, seed=13)
    rng = jax.random.PRNGKey(3)
    a = np.asarray(paint_plane(p, plane, z=0.5, halo=h_cal, rng=rng))
    b = np.asarray(paint_plane(p, plane, z=0.5, halo=h_ref, rng=rng))
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)
