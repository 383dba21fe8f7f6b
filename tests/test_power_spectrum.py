"""Power spectrum estimator tests against analytic fields (SURVEY §7.2)."""
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.power_spectrum import pseudo_pofk_2d


def test_white_noise_is_flat(rng):
    n, L, sigma = 128, 100.0, 2.0
    x = (rng.standard_normal((n, n)) * sigma).astype(np.float32)
    pk, k, pk_var, n_mode = pseudo_pofk_2d(jnp.asarray(x), L=L, n_k_bin=12)
    expected = sigma ** 2 * (L / n) ** 2
    pk = np.asarray(pk)
    n_mode = np.asarray(n_mode)
    # each bin within 5 sigma of the sampling error
    err = expected * np.sqrt(2.0 / np.maximum(n_mode, 1))
    assert np.all(np.abs(pk - expected) < 5 * err)
    # overall mean much tighter
    w = n_mode / n_mode.sum()
    assert abs((pk * w).sum() / expected - 1) < 0.05


def test_sine_mode_lands_in_right_bin():
    n, L = 128, 100.0
    m = 8  # integer mode
    amp = 3.0
    x = np.arange(n) / n
    field = amp * np.cos(2 * np.pi * m * x)[None, :] * np.ones((n, 1))
    pk, k, _, n_mode = pseudo_pofk_2d(jnp.asarray(field, dtype=jnp.float32),
                                      L=L, n_k_bin=16)
    pk, k = np.asarray(pk), np.asarray(k)
    k_target = 2 * np.pi * m / L
    i = int(np.argmax(pk))
    # peak bin must contain k_target
    assert abs(k[i] - k_target) / k_target < 0.5
    # the two +-m modes carry |f_k|^2 = (A n^2/2)^2 each
    # -> P = L^2/n^4 * A^2 n^4/4 = L^2 A^2/4 per mode, two modes total.
    total_power_peak = pk[i] * np.asarray(n_mode)[i]
    expected = 2 * (L ** 2) * (amp ** 2 / 4)
    np.testing.assert_allclose(total_power_peak, expected, rtol=1e-3)
    # all other bins carry (numerically) nothing
    others = np.delete(pk, i)
    assert np.all(others < 1e-6 * pk[i])


def test_cross_of_identical_fields_equals_auto(rng):
    n = 64
    x = rng.standard_normal((n, n)).astype(np.float32)
    pk_auto, *_ = pseudo_pofk_2d(jnp.asarray(x), L=50.0)
    pk_cross, *_ = pseudo_pofk_2d(jnp.asarray(x), jnp.asarray(x), L=50.0)
    np.testing.assert_allclose(np.asarray(pk_auto), np.asarray(pk_cross),
                               rtol=1e-5)


def test_cross_of_independent_fields_is_small(rng):
    n = 128
    a = rng.standard_normal((n, n)).astype(np.float32)
    b = rng.standard_normal((n, n)).astype(np.float32)
    pk_cross, _, _, n_mode = pseudo_pofk_2d(jnp.asarray(a), jnp.asarray(b), L=100.0)
    pk_auto, *_ = pseudo_pofk_2d(jnp.asarray(a), L=100.0)
    n_mode = np.asarray(n_mode)
    occupied = n_mode > 0
    ratio = (np.abs(np.asarray(pk_cross))[occupied]
             / np.asarray(pk_auto)[occupied])
    assert np.all(ratio < 5 / np.sqrt(n_mode[occupied]))


def test_batched_matches_loop(rng):
    n = 32
    batch = rng.standard_normal((3, n, n)).astype(np.float32)
    pk_b, k, var_b, n_mode = pseudo_pofk_2d(jnp.asarray(batch), L=10.0, n_k_bin=8)
    assert pk_b.shape == (3, 8)
    for i in range(3):
        pk_i, *_ = pseudo_pofk_2d(jnp.asarray(batch[i]), L=10.0, n_k_bin=8)
        np.testing.assert_allclose(np.asarray(pk_b[i]), np.asarray(pk_i),
                                   rtol=1e-5)


def test_shape_validation():
    with pytest.raises(ValueError):
        pseudo_pofk_2d(jnp.zeros((4, 8)), L=1.0)
    with pytest.raises(ValueError):
        pseudo_pofk_2d(jnp.zeros((8, 8)), jnp.zeros((4, 4)), L=1.0)


@pytest.mark.parametrize("n", [96, 100, 128, 384])
@pytest.mark.parametrize("L", [100.0, 120.0, 505.0])
def test_default_bins_keep_fundamental_and_nyquist(rng, n, L):
    """With DEFAULT k_min/k_max, the four fundamental modes must land in
    bin 0 and the axis-Nyquist modes in the last bin — edge-mode roundoff
    (fftfreq/logspace 1-ulp errors) used to leave bin 0 silently empty for
    most L, emptying the largest-scale bin of the primary fidelity gate."""
    x = rng.standard_normal((n, n)).astype(np.float32)
    pk, k, _, n_mode = pseudo_pofk_2d(jnp.asarray(x), L=L, n_k_bin=12)
    n_mode = np.asarray(n_mode)
    assert n_mode[0] >= 4, f"fundamental modes dropped (n={n}, L={L})"
    assert n_mode[-1] >= 2, f"Nyquist modes dropped (n={n}, L={L})"
    assert np.asarray(pk)[0] != 0.0


def test_pk_var_is_nonnegative(rng):
    """The one-pass variance must clamp at zero (f32 cancellation made it
    slightly negative for low-scatter bins, NaN-ing sqrt error bars)."""
    n = 128
    x = np.full((n, n), 0.0, np.float32)
    x[0, 1] = 1.0  # a single mode: zero scatter within its bin
    _, _, pk_var, _ = pseudo_pofk_2d(jnp.asarray(x), L=100.0, n_k_bin=12)
    assert (np.asarray(pk_var) >= 0).all()


def test_parseval(rng):
    """Sum over all modes of P equals variance * L^2 (power conservation)."""
    n, L = 64, 37.0
    x = rng.standard_normal((n, n)).astype(np.float32)
    x -= x.mean()
    pk, k, _, n_mode = pseudo_pofk_2d(jnp.asarray(x), L=L, n_k_bin=24,
                                      k_min=2 * np.pi / L * 0.999,
                                      k_max=2 * np.pi / L * (n / 2) * np.sqrt(2) * 1.001,
                                      logspaced_k_bins=False)
    total = float((np.asarray(pk) * np.asarray(n_mode)).sum())
    expected = float(x.var()) * L ** 2
    np.testing.assert_allclose(total, expected, rtol=1e-2)
