"""Tests for the BAHAMAS-like ("powerlaw") synthetic stack statistics.

The power-law mode makes the fidelity fixtures statistically closer to real
projected BAHAMAS slices (falling power-law P(k), growth-like z evolution,
smoothed stochastic pressure with correlated scatter) so the 5% P(k) gate
exercises a harder, more physical dm→pressure mapping than the default
Gaussian-bump fixture. See data/synthetic.py.
"""
import os
import pickle

import numpy as np
import pytest

from baryon_painter_tpu.data.synthetic import make_synthetic_stacks


@pytest.fixture(scope="module")
def stacks(tmp_path_factory):
    root = tmp_path_factory.mktemp("phys")
    info = make_synthetic_stacks(
        str(root), n_stack=4, n_grid=128, redshifts=(0.0, 1.0), seed=3,
        spectrum="powerlaw", spectrum_slope=-2.2, sigma0=1.2,
        pressure_noise=0.15, pressure_noise_corr=2.0)
    with open(info, "rb") as f:
        files = pickle.load(f)
    data = {}
    for e in files:
        for depth in ("100", "150"):
            data[(e["field"], e["z"], depth)] = np.load(
                os.path.join(str(root), e[f"file_{depth}"]))
    return data


def _pofk(field):
    """Isotropic binned power spectrum of one 2-D field (grid units)."""
    n = field.shape[-1]
    d = field / field.mean() - 1.0
    fk = np.fft.fft2(d)
    p2 = (fk * np.conj(fk)).real / n**4
    f = np.fft.fftfreq(n) * n
    k = np.sqrt(f[:, None] ** 2 + f[None, :] ** 2)
    bins = np.geomspace(3, n / 2, 12)
    kc, pk = [], []
    for lo, hi in zip(bins[:-1], bins[1:]):
        m = (k >= lo) & (k < hi)
        if m.sum() > 4:
            kc.append(k[m].mean())
            pk.append(p2[m].mean())
    return np.asarray(kc), np.asarray(pk)


def test_density_spectrum_is_falling_powerlaw(stacks):
    dm = stacks[("dm", 0.0, "100")]
    slopes = []
    for tile in dm:
        kc, pk = _pofk(tile)
        # fit over mid-k (away from the k_cut and the noise floor)
        m = (kc > 4) & (kc < 40)
        slope = np.polyfit(np.log(kc[m]), np.log(pk[m]), 1)[0]
        slopes.append(slope)
    s = np.mean(slopes)
    # lognormal mapping flattens the precursor slope a bit; demand a clearly
    # falling power law in the right range rather than the exact input
    assert -3.0 < s < -1.2, f"measured slope {s}"


def test_growth_like_redshift_evolution(stacks):
    def contrast(a):
        return float(np.std(a / a.mean(axis=(-2, -1), keepdims=True)))
    lo_z = contrast(stacks[("dm", 0.0, "100")])
    hi_z = contrast(stacks[("dm", 1.0, "100")])
    assert lo_z > 1.2 * hi_z, (lo_z, hi_z)


def test_pressure_coupled_but_stochastic(stacks):
    dm = stacks[("dm", 0.0, "100")]
    pr = stacks[("pressure", 0.0, "100")]
    rs = []
    for a, b in zip(dm, pr):
        da, db = a - a.mean(), b - b.mean()
        rs.append(float((da * db).mean()
                        / np.sqrt((da**2).mean() * (db**2).mean())))
    r = np.mean(rs)
    # strongly coupled (a painter can learn it) but not deterministic
    # (conditional scatter exists, as in hydro simulations)
    assert 0.5 < r < 0.995, r


def test_positive_and_finite(stacks):
    for arr in stacks.values():
        assert np.all(np.isfinite(arr))
        assert arr.min() > 0


def test_default_mode_unchanged(tmp_path):
    """The historical fixture must stay bit-identical (committed trained
    models re-evaluate against data regenerated with default arguments)."""
    import hashlib
    root = tmp_path / "default"
    make_synthetic_stacks(str(root), n_stack=2, n_grid=64,
                          redshifts=(0.0, 0.5, 1.0), seed=7)
    h = hashlib.sha256()
    for fn in sorted(os.listdir(root)):
        if fn.endswith(".npy"):
            h.update(fn.encode())
            h.update(np.load(root / fn).tobytes())
    assert h.hexdigest() == ("7b48b0af6a20bbc9b80951aed79ba731"
                             "c0c4db450bfb3b21aca955a3012e8399")
