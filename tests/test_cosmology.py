"""Cosmology background tests: quadrature crosscheck + analytic limits."""
import numpy as np
from scipy.integrate import quad

from baryon_painter_tpu.cosmology import C_KM_S, Cosmology, SLICS_COSMOLOGY


def test_comoving_distance_against_quadrature():
    cosmo = SLICS_COSMOLOGY()
    for z in [0.042, 0.5, 1.0, 2.0, 3.0]:
        want, _ = quad(lambda zz: 1.0 / cosmo.E(zz), 0.0, z)
        want *= C_KM_S / (100.0 * cosmo.h)
        got = cosmo.comoving_distance(z)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_eds_analytic():
    """Einstein-de-Sitter: chi = 2c/H0 (1 - 1/sqrt(1+z))."""
    cosmo = Cosmology(Omega_m=1.0, h=0.7)
    z = np.array([0.1, 0.5, 1.0, 4.0])
    want = 2 * C_KM_S / (100.0 * 0.7) * (1 - 1 / np.sqrt(1 + z))
    np.testing.assert_allclose(cosmo.comoving_distance(z), want, rtol=1e-5)


def test_scale_factor_of_chi_inverts_distance():
    cosmo = SLICS_COSMOLOGY()
    z = np.array([0.0, 0.3, 1.2, 2.5])
    chi = cosmo.comoving_distance(z)
    a = cosmo.scale_factor_of_chi(chi)
    np.testing.assert_allclose(a, 1 / (1 + z), rtol=1e-6)


def test_flat_angular_equals_comoving():
    cosmo = SLICS_COSMOLOGY()
    z = np.array([0.5, 1.5])
    np.testing.assert_allclose(cosmo.comoving_angular_distance(z),
                               cosmo.comoving_distance(z))


def test_slics_slice_redshifts_monotone():
    """z_slice construction from create_lightcone.py:98 works and is monotone."""
    cosmo = SLICS_COSMOLOGY()
    h = cosmo.h
    z_slice = np.array([cosmo.redshift_of_chi(252.5 / h * i) for i in range(15)])
    assert z_slice[0] == 0.0
    assert np.all(np.diff(z_slice) > 0)
    assert z_slice[-1] < 4.0
