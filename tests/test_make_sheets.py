"""Native make_sheets gridder vs a numpy oracle on synthetic particle files.

The oracle independently implements the McCarthy-format physics and NGP/CIC
sheet deposition (constants per code/make_grid/constants.f90; behavior per
BAHAMAS_sheets.f90 with the proj-2/3 CIC weight-axis fix documented in the
tool's header).
"""
import os
import struct
import subprocess

import numpy as np
import pytest

# quick-tier exclusion: native toolchain build + oracle runs
pytestmark = pytest.mark.slow

TOOL_DIR = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "make_sheets")
TOOL = os.path.join(TOOL_DIR, "make_sheets")

CRIT = 2.775e11
MSUN, MP = 1.989e30, 1.6726e-27
MPC_CM = 3.086e22 / 0.01
EV_ERG = 1.60218e-19 * 1e7
FH, MU, XE, XI = 0.752, 0.61, 1.17, 1.08


@pytest.fixture(scope="module", autouse=True)
def build_tool():
    subprocess.run(["make", "-C", TOOL_DIR], check=True,
                   capture_output=True)
    assert os.path.exists(TOOL)


def write_mccarthy(path, pos, mass, ep=None, nh=None):
    n = len(mass)
    with open(path, "wb") as f:
        f.write(struct.pack("<i", n))
        f.write((mass / 1e10).astype("<f4").tobytes())
        f.write(pos.astype("<f4").tobytes())
        if ep is not None:
            f.write(ep.astype("<f4").tobytes())
            f.write(nh.astype("<f4").tobytes())


def cell_of(x, L, m):
    c = np.where(x == 0, 1, np.ceil(x * m / L)).astype(int) - 1
    return np.clip(c, 0, m - 1)


def sheet_of(c, m, ns):
    return np.ceil((c + 1) / m * ns).astype(int) - 1


def oracle_ngp(pos, w, L, m, ns):
    d = np.zeros((3, ns, m, m))
    ix, iy, iz = (cell_of(pos[:, a], L, m) for a in range(3))
    for i in range(len(w)):
        d[0, sheet_of(ix[i], m, ns), iy[i], iz[i]] += w[i]
        d[1, sheet_of(iy[i], m, ns), ix[i], iz[i]] += w[i]
        d[2, sheet_of(iz[i], m, ns), ix[i], iy[i]] += w[i]
    return d


def oracle_cic(pos, w, L, m, ns):
    d = np.zeros((3, ns, m, m))
    for i in range(len(w)):
        ic, nb, frac = [], [], []
        for a in range(3):
            c = int(cell_of(np.array([pos[i, a]]), L, m)[0])
            dx = pos[i, a] / L * m - (c + 0.5)
            if dx >= 0:
                n = (c + 1) % m
            else:
                n = (c - 1) % m
                dx = -dx
            ic.append(c); nb.append(n); frac.append(dx)
        for corner in range(8):
            cw = w[i]
            idx = []
            for a in range(3):
                if corner & (1 << a):
                    cw *= frac[a]
                    idx.append(nb[a])
                else:
                    cw *= 1 - frac[a]
                    idx.append(ic[a])
            d[0, sheet_of(idx[0], m, ns), idx[1], idx[2]] += cw
            d[1, sheet_of(idx[1], m, ns), idx[0], idx[2]] += cw
            d[2, sheet_of(idx[2], m, ns), idx[0], idx[1]] += cw
    return d


def read_field(path, m, ns):
    flat = np.fromfile(path, dtype="<f4")
    # Fortran order (3, ns, m, m): first index fastest
    return flat.reshape(m, m, ns, 3).T  # -> (3, ns, m, m)


@pytest.mark.parametrize("binning", ["NGP", "CIC"])
def test_dm_density_matches_oracle(tmp_path, rng, binning):
    L, m, ns, n = 100.0, 8, 2, 300
    om_m, h = 0.3, 0.7
    pos = rng.uniform(0, L, size=(n, 3)).astype(np.float32)
    pos[0] = [0.0, L - 1e-4, 50.0]  # edge cases
    mass = rng.uniform(0.5, 2.0, size=n).astype(np.float32) * 1e10
    write_mccarthy(tmp_path / "sim_dm.dat", pos, mass)

    subprocess.run([TOOL, str(tmp_path / "sim"), str(om_m), str(h), str(L),
                    str(m), str(tmp_path / "out"), str(ns), binning],
                   check=True, capture_output=True)
    got = read_field(str(tmp_path / "out_dm_sheets"), m, ns)

    avg_cell = CRIT * om_m * L ** 3 / m ** 3
    oracle = oracle_ngp if binning == "NGP" else oracle_cic
    want = oracle(pos.astype(np.float64), mass.astype(np.float64),
                  L, m, ns) / avg_cell
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-8)
    # mass conservation
    np.testing.assert_allclose(got[0].sum() * avg_cell, mass.sum(),
                               rtol=1e-5)


def test_gas_pressure_matches_oracle(tmp_path, rng):
    L, m, ns, n = 50.0, 4, 2, 200
    om_m, h = 0.3, 0.7
    pos = rng.uniform(0, L, size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, size=n).astype(np.float32) * 1e10
    ep = rng.uniform(1e-18, 1e-15, size=n).astype(np.float32)
    nh = rng.uniform(1e-5, 1e-2, size=n).astype(np.float32)
    nh[:20] = 0.5  # above the 0.1 cm^-3 cut -> excluded from pressure
    write_mccarthy(tmp_path / "sim_gas.dat", pos, mass, ep, nh)
    write_mccarthy(tmp_path / "sim_dm.dat", pos[:10], mass[:10])

    subprocess.run([TOOL, str(tmp_path / "sim"), str(om_m), str(h), str(L),
                    str(m), str(tmp_path / "out"), str(ns), "NGP"],
                   check=True, capture_output=True)
    got_gas = read_field(str(tmp_path / "out_gas_sheets"), m, ns)
    got_p = read_field(str(tmp_path / "out_pressure_sheets"), m, ns)

    avg_cell = CRIT * om_m * L ** 3 / m ** 3
    want_gas = oracle_ngp(pos.astype(np.float64), mass.astype(np.float64),
                          L, m, ns) / avg_cell
    np.testing.assert_allclose(got_gas, want_gas, rtol=2e-5, atol=1e-8)

    # pressure weights: kT -> comoving electron pressure
    kT = (XE + XI) / XE * (ep.astype(np.float64) / nh) * MU * FH / EV_ERG
    kT[nh > 0.1] = 0.0
    v_cell = (L / m) ** 3 / h ** 3
    units = MSUN / MP / MPC_CM ** 3
    pw = kT * (mass / MU) * XE / (XE + XI) / v_cell * units
    want_p = oracle_ngp(pos.astype(np.float64), pw, L, m, ns)
    np.testing.assert_allclose(got_p, want_p, rtol=2e-4, atol=1e-20)


def test_empty_and_missing_files(tmp_path, rng):
    # n==1 sentinel means empty (BAHAMAS_sheets.f90:254-256)
    with open(tmp_path / "sim_stars.dat", "wb") as f:
        f.write(struct.pack("<i", 1))
    pos = rng.uniform(0, 10.0, size=(5, 3)).astype(np.float32)
    mass = np.ones(5, np.float32) * 1e10
    write_mccarthy(tmp_path / "sim_dm.dat", pos, mass)
    subprocess.run([TOOL, str(tmp_path / "sim"), "0.3", "0.7", "10.0", "4",
                    str(tmp_path / "out"), "2", "CIC"], check=True,
                   capture_output=True)
    stars = np.fromfile(str(tmp_path / "out_stars_sheets"), dtype="<f4")
    assert stars.shape == (3 * 2 * 4 * 4,)
    np.testing.assert_array_equal(stars, 0.0)
    # missing dm file -> error exit
    r = subprocess.run([TOOL, str(tmp_path / "nope"), "0.3", "0.7", "10.0",
                        "4", str(tmp_path / "out"), "2", "CIC"],
                       capture_output=True)
    assert r.returncode != 0


@pytest.mark.parametrize("binning", ["NGP", "CIC"])
def test_threaded_deposition_matches_serial(tmp_path, rng, binning):
    """OMP_NUM_THREADS=4 must reproduce the serial output byte-for-byte
    (per-thread accumulators reduced deterministically; double-add
    reassociation is invisible at the emitted float32 precision)."""
    n, L, m, ns = 5000, 10.0, 8, 4
    pos = rng.uniform(0, L, size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, size=n).astype(np.float32) * 1e10
    write_mccarthy(tmp_path / "sim_dm.dat", pos, mass)

    outs = {}
    for nt in ("1", "4"):
        outdir = tmp_path / f"t{nt}"
        os.makedirs(outdir)
        env = dict(os.environ, OMP_NUM_THREADS=nt)
        subprocess.run([TOOL, str(tmp_path / "sim"), "0.3", "0.7", str(L),
                        str(m), str(outdir / "out"), str(ns), binning],
                       check=True, capture_output=True, env=env)
        fn = [f for f in os.listdir(outdir) if "dm" in f][0]
        with open(outdir / fn, "rb") as f:
            outs[nt] = f.read()
    assert outs["1"] == outs["4"], "threaded deposition differs from serial"
