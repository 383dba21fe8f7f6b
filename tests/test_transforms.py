"""Transform tests: golden values vs numpy reference formulas + round trips.

Mirrors the reference test strategy (tests/test_transforms.py round-trip,
tests/test_dataset.py:65-83 inverse-transform tolerance) but hermetic.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.transforms import (
    ChainTransform,
    FieldStats,
    RangeCompress,
    SplitScale,
    ToDelta,
    gaussian_filter_2d,
    transform_from_dict,
)

Z_GRID = np.array([0.0, 0.125, 0.25, 0.5, 1.0, 2.0], dtype=np.float32)


def make_stats(rng):
    mean = rng.uniform(0.5, 2.0, size=len(Z_GRID)).astype(np.float32)
    var = rng.uniform(0.5, 4.0, size=len(Z_GRID)).astype(np.float32)
    return FieldStats(jnp.asarray(Z_GRID), jnp.asarray(mean), jnp.asarray(var))


def numpy_interp_stats(stats, z):
    """Reference interpolate_z semantics (data_transforms.py:52-64)."""
    z_list = list(np.asarray(stats.z_grid))
    idx = np.searchsorted(z_list, z, side="right")
    if idx >= len(z_list):
        return float(stats.mean[-1]), float(stats.var[-1])
    if idx <= 0:
        return float(stats.mean[0]), float(stats.var[0])
    w = (z - z_list[idx - 1]) / (z_list[idx] - z_list[idx - 1])
    mean = w * float(stats.mean[idx]) + (1 - w) * float(stats.mean[idx - 1])
    var = w * float(stats.var[idx]) + (1 - w) * float(stats.var[idx - 1])
    return mean, var


@pytest.mark.parametrize("z", [0.0, 0.1, 0.3, 1.3, 2.0, 3.0, -1.0])
def test_stats_interpolation_matches_reference(rng, z):
    stats = make_stats(rng)
    mean, var = stats.at_z(z)
    ref_mean, ref_var = numpy_interp_stats(stats, z)
    np.testing.assert_allclose(float(mean), ref_mean, rtol=1e-6)
    np.testing.assert_allclose(float(var), ref_var, rtol=1e-6)


def numpy_forward(mode, k, eps, x, mean, std):
    """Reference forward formulas, data_transforms.py:66-86."""
    if mode == "log":
        return np.where(x > 0, np.log(np.where(x > 0, x, 1) / std + eps) / k,
                        np.log(eps) / k)
    if mode == "shift-log":
        return np.log(x / std + 1) / k
    if mode == "shift-log-2p":
        return np.log(x / std + k[0]) / k[1]
    if mode == "log-tanh":
        return np.where(x > 0, np.tanh(np.log(np.where(x > 0, x, 1) / std + eps) / k), -1)
    if mode == "x/(1+x)":
        return x / (x + std) * k[0] - k[1]
    if mode == "1/x":
        return np.where(x / (std * mean * k) > -1, 2 / (x / (std * mean * k) + 1) - 1.001, -1)
    raise AssertionError(mode)


MODE_CASES = [
    ("log", 4.0),
    ("shift-log", 4.0),
    ("shift-log-2p", (0.01, 4.0)),
    ("log-tanh", 4.0),
    ("x/(1+x)", (2.0, 1.0)),
    ("1/x", 1.5),
]


@pytest.mark.parametrize("mode,k", MODE_CASES)
def test_forward_matches_reference_formula(rng, mode, k):
    stats = make_stats(rng)
    z = 0.3
    x = rng.uniform(0.01, 50.0, size=(32, 32)).astype(np.float32)
    t = RangeCompress(mode=mode, k=k, eps=1e-4)
    got = np.asarray(t.forward(jnp.asarray(x), stats, z))
    mean, var = numpy_interp_stats(stats, z)
    want = numpy_forward(mode, k, 1e-4, x, mean, np.sqrt(var))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("mode,k", MODE_CASES)
def test_round_trip(rng, mode, k):
    """inv(fwd(x)) == x within the reference's tolerance (2e-5 * sigma)."""
    stats = make_stats(rng)
    z = 0.6
    x = rng.uniform(0.0, 100.0, size=(64, 64)).astype(np.float32)
    t = RangeCompress(mode=mode, k=k, eps=1e-4)
    y = t.forward(jnp.asarray(x), stats, z)
    x_rec = np.asarray(t.inverse(y, stats, z))
    _, var = numpy_interp_stats(stats, z)
    atol = 2e-5 * np.sqrt(var) * 10  # float32 headroom
    np.testing.assert_allclose(x_rec, x, atol=atol, rtol=1e-3)


def test_one_over_x_round_trips_bright_pixels(rng):
    """The '1/x' forward maps very large x into (-1.001, -1); the inverse
    must accept that full range — a cutoff at -1 zeroed exactly the
    brightest pixels (cluster cores) on the round trip."""
    stats = make_stats(rng)
    z = 0.6
    t = RangeCompress(mode="1/x", k=1.5)
    mean, var = numpy_interp_stats(stats, z)
    big = np.float32(3000.0 * np.sqrt(var) * mean * 1.5)
    x = np.array([[big, 2 * big]], np.float32)
    rec = np.asarray(t.inverse(t.forward(jnp.asarray(x), stats, z), stats, z))
    np.testing.assert_allclose(rec, x, rtol=5e-3)


def test_shift_log_overshoot_stays_finite(rng):
    """B-spline zoom (order 3/5) overshoots below zero near sharp features
    (process_SLICS.py:205). shift-log must saturate such pixels at the eps
    floor instead of painting NaN through the whole conv stack — the
    lightcone NaN incident of round 3."""
    stats = make_stats(rng)
    z = 0.3
    _, var = numpy_interp_stats(stats, z)
    std = np.sqrt(var)
    for mode, k in (("shift-log", 4.0), ("shift-log-2p", (0.01, 4.0))):
        t = RangeCompress(mode=mode, k=k, eps=1e-4)
        # one deep overshoot (x/std + shift <= 0), one valid pixel
        x = np.array([[-5.0 * std, 2.0 * std]], np.float32)
        y = np.asarray(t.forward(jnp.asarray(x), stats, z))
        assert np.all(np.isfinite(y)), (mode, y)
        kk = k if mode == "shift-log" else k[1]
        np.testing.assert_allclose(y[0, 0], np.log(1e-4) / kk, rtol=1e-5)
        # the floor must not disturb valid pixels
        shift = 1.0 if mode == "shift-log" else k[0]
        np.testing.assert_allclose(y[0, 1], np.log(2.0 + shift) / kk,
                                   rtol=1e-4)
        # gradient stays finite through the floor (spectral fine-tune path)
        g = jax.grad(lambda v: jnp.sum(t.forward(v, stats, z)))(
            jnp.asarray(x))
        assert np.all(np.isfinite(np.asarray(g)))
        # the floor must NOT mask NaN input (corrupt reads fail loudly)
        y_nan = np.asarray(t.forward(jnp.asarray([[np.nan]]), stats, z))
        assert np.isnan(y_nan).all()
    # 2p with a shift smaller than eps: a legitimate zero pixel keeps the
    # reference encoding log(k0)/k1 (the floor caps at min(eps, k0))
    t2p = RangeCompress(mode="shift-log-2p", k=(1e-5, 4.0), eps=1e-3)
    y0 = np.asarray(t2p.forward(jnp.zeros((1, 1)), stats, z))
    np.testing.assert_allclose(y0[0, 0], np.log(1e-5) / 4.0, rtol=1e-4)


def test_fwd_of_inv_exact(rng):
    """fwd(inv(y)) == y exactly-ish (mirrors test_dataset.py:71-74)."""
    stats = make_stats(rng)
    t = RangeCompress(mode="shift-log", k=4.0)
    y = rng.uniform(-0.2, 1.5, size=(32, 32)).astype(np.float32)
    y2 = np.asarray(t.forward(t.inverse(jnp.asarray(y), stats, 0.25), stats, 0.25))
    np.testing.assert_allclose(y2, y, rtol=1e-3, atol=5e-5)


def test_to_delta_round_trip(rng):
    stats = make_stats(rng)
    x = rng.uniform(0.1, 10.0, size=(16, 16)).astype(np.float32)
    t = ToDelta()
    rec = np.asarray(t.inverse(t.forward(jnp.asarray(x), stats, 0.7), stats, 0.7))
    np.testing.assert_allclose(rec, x, rtol=1e-5)


def test_batched_z_broadcast(rng):
    """Per-sample redshifts broadcast against (N, H, W) batches."""
    stats = make_stats(rng)
    t = RangeCompress(mode="shift-log", k=4.0)
    x = rng.uniform(0.0, 10.0, size=(3, 8, 8)).astype(np.float32)
    zs = np.array([0.0, 0.5, 1.5], dtype=np.float32)
    batched = np.asarray(t.forward(jnp.asarray(x), stats, jnp.asarray(zs)))
    for i, z in enumerate(zs):
        single = np.asarray(t.forward(jnp.asarray(x[i]), stats, float(z)))
        np.testing.assert_allclose(batched[i], single, rtol=1e-6)


def test_split_scale_reconstruction(rng):
    """Scale 0 preserves the original; bands sum back to it
    (mirrors reference tests/test_transforms.py:5-15)."""
    x = rng.standard_normal((64, 64)).astype(np.float32)
    t = SplitScale(n_scale=3, step_size=2, include_original=True)
    out = np.asarray(t.forward(jnp.asarray(x)))
    assert out.shape == (4, 64, 64)
    np.testing.assert_allclose(out[0], x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[1:].sum(axis=0), x, rtol=1e-4, atol=1e-5)
    rec = np.asarray(t.inverse(jnp.asarray(out)))
    np.testing.assert_allclose(rec, x, rtol=1e-5, atol=1e-6)

    t2 = SplitScale(n_scale=3, step_size=2, include_original=False)
    out2 = np.asarray(t2.forward(jnp.asarray(x)))
    assert out2.shape == (3, 64, 64)
    rec2 = np.asarray(t2.inverse(jnp.asarray(out2)))
    np.testing.assert_allclose(rec2, x, rtol=1e-4, atol=1e-5)


def test_gaussian_filter_matches_scipy(rng):
    from scipy.ndimage import gaussian_filter

    x = rng.standard_normal((32, 48)).astype(np.float32)
    for sigma in (0.5, 1.0, 2.0):
        got = np.asarray(gaussian_filter_2d(jnp.asarray(x), sigma=sigma))
        want = gaussian_filter(x, sigma=sigma, truncate=3.0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_chain_and_serialization(rng):
    stats = make_stats(rng)
    chain = ChainTransform(steps=(RangeCompress(mode="shift-log", k=4.0),))
    x = rng.uniform(0.0, 10.0, size=(16, 16)).astype(np.float32)
    y = chain.forward(jnp.asarray(x), stats, 0.5)
    rec = np.asarray(chain.inverse(y, stats, 0.5))
    np.testing.assert_allclose(rec, x, rtol=1e-3, atol=1e-4)

    d = chain.to_dict()
    chain2 = transform_from_dict(d)
    y2 = np.asarray(chain2.forward(jnp.asarray(x), stats, 0.5))
    np.testing.assert_allclose(np.asarray(y), y2)

    s = stats.to_dict()
    stats2 = FieldStats.from_dict(s)
    np.testing.assert_allclose(np.asarray(stats2.mean), np.asarray(stats.mean))


def test_transform_is_jittable_and_differentiable(rng):
    stats = make_stats(rng)
    t = RangeCompress(mode="shift-log", k=4.0)

    @jax.jit
    def f(x, z):
        return t.forward(x, stats, z).sum()

    x = jnp.asarray(rng.uniform(0.1, 5.0, size=(8, 8)).astype(np.float32))
    val = f(x, 0.4)
    assert np.isfinite(float(val))
    g = jax.grad(lambda x: f(x, 0.4))(x)
    assert np.all(np.isfinite(np.asarray(g)))
