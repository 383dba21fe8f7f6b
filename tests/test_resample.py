"""B-spline resampler parity tests against scipy.ndimage."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import spline_filter1d, zoom as scipy_zoom

from baryon_painter_tpu.ops.resample import spline_filter_1d, zoom

# quick-tier exclusion: spline-prefilter compiles per order/mode (run with the full suite)
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("order", [3, 5])
@pytest.mark.parametrize("mode", ["mirror", "reflect"])
def test_prefilter_matches_scipy(rng, order, mode):
    x = rng.standard_normal(37).astype(np.float32)
    got = np.asarray(spline_filter_1d(jnp.asarray(x), order, mode))
    want = spline_filter1d(x.astype(np.float64), order=order, mode=mode)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("order", [3, 5])
def test_prefilter_batched(rng, order):
    x = rng.standard_normal((4, 25)).astype(np.float32)
    got = np.asarray(spline_filter_1d(jnp.asarray(x), order, "mirror"))
    for i in range(4):
        want = spline_filter1d(x[i].astype(np.float64), order=order, mode="mirror")
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("order", [0, 1, 3, 5])
@pytest.mark.parametrize("mode", ["mirror", "reflect"])
@pytest.mark.parametrize("zf", [0.4, 1.0, 1.7, 2.0])
def test_zoom_matches_scipy(rng, order, mode, zf):
    x = rng.standard_normal((24, 30)).astype(np.float32)
    got = np.asarray(zoom(jnp.asarray(x), zf, order=order, mode=mode))
    want = scipy_zoom(x.astype(np.float64), zoom=zf, order=order, mode=mode)
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4 * scale)


def test_zoom_nearest_matches_scipy_at_half_integer_coords():
    """order=0 must use scipy's floor(x+0.5) nearest rule; round-half-to-
    even diverged on even zoom ratios (exact .5 coordinates)."""
    x = np.arange(9, dtype=np.float32).reshape(3, 3)
    got = np.asarray(zoom(jnp.asarray(x), 5 / 3, order=0, mode="reflect"))
    want = scipy_zoom(x, zoom=5 / 3, order=0, mode="reflect")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("order", [2, 3, 4, 5])
@pytest.mark.parametrize("mode", ["mirror", "reflect"])
@pytest.mark.parametrize("n", [5, 23, 200])
def test_fir_prefilter_matches_fft(rng, order, mode, n):
    """The truncated-FIR inverse-spline filter is the default; it must agree
    with the exact FFT circular deconvolution to ~1e-6 at every length —
    including n smaller than the FIR half-width (periodic wrap of the pad)."""
    x = rng.standard_normal((3, n)).astype(np.float32)
    fir = np.asarray(spline_filter_1d(jnp.asarray(x), order, mode, impl="fir"))
    fft = np.asarray(spline_filter_1d(jnp.asarray(x), order, mode, impl="fft"))
    np.testing.assert_allclose(fir, fft, rtol=2e-5,
                               atol=2e-5 * np.abs(fft).max())


def test_zoom_identity(rng):
    x = rng.standard_normal((16, 16)).astype(np.float32)
    got = np.asarray(zoom(jnp.asarray(x), 1.0, order=3, mode="mirror"))
    np.testing.assert_allclose(got, x, rtol=1e-4, atol=1e-5)


def test_zoom_batched(rng):
    x = rng.standard_normal((3, 20, 20)).astype(np.float32)
    got = np.asarray(zoom(jnp.asarray(x), 1.6, order=3, mode="mirror"))
    assert got.shape == (3, 32, 32)
    for i in range(3):
        want = scipy_zoom(x[i].astype(np.float64), 1.6, order=3, mode="mirror")
        np.testing.assert_allclose(got[i], want, rtol=2e-3,
                                   atol=2e-4 * np.abs(want).max())


def test_anisotropic_zoom(rng):
    x = rng.standard_normal((12, 20)).astype(np.float32)
    got = np.asarray(zoom(jnp.asarray(x), (2.0, 0.5), order=3, mode="mirror"))
    want = scipy_zoom(x.astype(np.float64), (2.0, 0.5), order=3, mode="mirror")
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4 * np.abs(want).max())


def test_lightcone_shapes():
    """The shapes used by the SLICS pipeline (tile -> 512 px) round-trip."""
    x = jnp.ones((800, 800))
    out = zoom(x, 512 / 800, order=3, mode="reflect")
    assert out.shape == (512, 512)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


@pytest.mark.parametrize("order", [3, 5])
def test_prefilter_wrap_matches_scipy(rng, order):
    x = rng.standard_normal(37).astype(np.float32)
    got = np.asarray(spline_filter_1d(jnp.asarray(x), order, "wrap"))
    want = spline_filter1d(x.astype(np.float64), order=order,
                           mode="grid-wrap")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("order", [0, 1, 3, 5])
@pytest.mark.parametrize("zf", [0.4, 1.0, 1.7, 2.0])
def test_zoom_wrap_matches_scipy_grid_wrap(rng, order, zf):
    """mode='wrap' == scipy grid_mode=True / 'grid-wrap': the periodic
    resampling the seamless lightcone path uses for whole planes."""
    x = rng.standard_normal((24, 30)).astype(np.float32)
    got = np.asarray(zoom(jnp.asarray(x), zf, order=order, mode="wrap"))
    want = scipy_zoom(x.astype(np.float64), zoom=zf, order=order,
                      mode="grid-wrap", grid_mode=True)
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4 * scale)


def test_zoom_wrap_is_shift_equivariant(rng):
    """The seam-free property: circularly shifting the input by k pixels
    shifts the wrap-zoomed output by exactly k * zf pixels — impossible
    with mirror/reflect, whose boundary bands depend on edge position."""
    x = rng.standard_normal((16, 20)).astype(np.float32)
    zf = 2.0
    a = np.asarray(zoom(jnp.asarray(x), zf, order=3, mode="wrap"))
    b = np.asarray(zoom(jnp.asarray(np.roll(x, (3, 5), (0, 1))), zf,
                        order=3, mode="wrap"))
    np.testing.assert_allclose(np.roll(a, (6, 10), (0, 1)), b,
                               rtol=1e-5, atol=1e-5)
