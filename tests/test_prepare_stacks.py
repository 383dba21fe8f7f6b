"""End-to-end preprocessing chain: make_sheets binary -> stacks -> dataset."""
import os
import runpy
import struct
import subprocess
import sys

import numpy as np
import pytest

# quick-tier exclusion: stack-building pipeline (run with the full suite)
pytestmark = pytest.mark.slow

TOOL_DIR = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "make_sheets")
TOOL = os.path.join(TOOL_DIR, "make_sheets")
SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "prepare_stacks.py")


@pytest.fixture(scope="module", autouse=True)
def build_tool():
    subprocess.run(["make", "-C", TOOL_DIR], check=True, capture_output=True)


def write_particles(tmp, base, rng, L, with_gas=True):
    n = 500
    pos = rng.uniform(0, L, size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, size=n).astype(np.float32)
    with open(tmp / f"{base}_dm.dat", "wb") as f:
        f.write(struct.pack("<i", n))
        f.write(mass.tobytes())
        f.write(pos.tobytes())
    if with_gas:
        ep = rng.uniform(1e-18, 1e-16, size=n).astype(np.float32)
        nh = rng.uniform(1e-5, 1e-3, size=n).astype(np.float32)
        with open(tmp / f"{base}_gas.dat", "wb") as f:
            f.write(struct.pack("<i", n))
            f.write(mass.tobytes())
            f.write(pos.tobytes())
            f.write(ep.tobytes())
            f.write(nh.tobytes())
        with open(tmp / f"{base}_stars.dat", "wb") as f:
            f.write(struct.pack("<i", 1))  # empty


def test_sheets_to_stacks_to_dataset(tmp_path, rng):
    L, mesh, n_sheet = 400.0, 32, 8
    # two 'volumes' at one 'snapshot'
    for vol in ("v1", "v2"):
        write_particles(tmp_path, f"sim_{vol}", rng, L)
        subprocess.run([TOOL, str(tmp_path / f"sim_{vol}"), "0.3", "0.7",
                        str(L), str(mesh), str(tmp_path / f"{vol}_snap32"),
                        str(n_sheet), "CIC"], check=True,
                       capture_output=True)

    scheme = {"v1": {"x": [(0, 3), (3, 6), (6, 8)],
                     "y": [(0, 3), (3, 6), (6, 8)]},
              "v2": {"x": [(0, 2), (2, 4), (4, 6), (6, 8)]}}
    import json
    with open(tmp_path / "scheme.json", "w") as f:
        json.dump({v: {p: [list(r) for r in rs] for p, rs in ps.items()}
                   for v, ps in scheme.items()}, f)

    out = tmp_path / "stacks"
    argv = sys.argv
    sys.argv = ["prepare_stacks.py", "--sheets-path", str(tmp_path),
                "--output-path", str(out), "--fields", "dm", "pressure",
                "--redshifts", "0.0", "--n-sheet", str(n_sheet),
                "--n-grid", str(mesh), "--scheme-json",
                str(tmp_path / "scheme.json")]
    try:
        runpy.run_path(SCRIPT, run_name="__main__")
    finally:
        sys.argv = argv

    # 100 Mpc/h slices: v1 contributes 2 (one per projection), v2: 4
    d100 = np.load(out / "dm_z0.000_100.npy")
    d150 = np.load(out / "dm_z0.000_150.npy")
    assert d100.shape == (6, mesh, mesh)
    assert d150.shape == (4, mesh, mesh)

    # slice content equals the sheet sums
    flat = np.fromfile(tmp_path / "v1_snap32_dm_sheets", dtype="<f4")
    sheets = flat.reshape(mesh, mesh, n_sheet, 3).T
    np.testing.assert_allclose(d150[0], sheets[0, 0:3].sum(axis=0), rtol=1e-6)
    np.testing.assert_allclose(d100[0], sheets[0, 6:8].sum(axis=0), rtol=1e-6)

    # the produced files feed straight into the dataset
    from baryon_painter_tpu.data.dataset import (BahamasTileDataset,
                                                 load_file_info)
    info = load_file_info(str(out / "train_files_info.pickle"))
    ds = BahamasTileDataset(files=info, root_path=str(out), n_tile=2,
                            redshifts=[0.0])
    sample, idx, z = ds[0]
    assert sample[0].shape == (mesh // 2, mesh // 2)
    assert z == 0.0
