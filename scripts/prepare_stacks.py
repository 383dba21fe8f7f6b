#!/usr/bin/env python
"""Build training stacks (.npy + files-info pickle) from make_sheets output.

CLI equivalent of the reference's prepare_simulation_data notebook: each
simulation volume is gridded into (3 projections x n_sheet) sheets of
L/n_sheet Mpc/h depth by tools/make_sheets; this script sums consecutive
sheets into 150 Mpc/h (3-sheet) and 100 Mpc/h (2-sheet) slices following a
per-volume slicing scheme, stacks them into (n_stack, n_grid, n_grid) arrays
per (field, redshift, depth), and writes the *_files_info.pickle that
BahamasTileDataset consumes.

Default slicing scheme (per prepare_simulation_data.ipynb cell 7): volumes
v1/v2 use (3,3,2) sheet splits per projection, v3 mixes (3,2,2) and
(2,2,2,2), v4 uses (3,3,2)/(3,3,2)/(3,2,2) - totalling 14 slices of each
depth across four volumes.
"""
import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (start, stop) sheet ranges per projection; len==3 sheets -> 150 Mpc/h,
# len==2 -> 100 Mpc/h (with the default L=400, n_sheet=8 geometry).
DEFAULT_SCHEME = {
    "v1": {"x": [(0, 3), (3, 6), (6, 8)],
           "y": [(0, 3), (3, 6), (6, 8)],
           "z": [(0, 3), (3, 6), (6, 8)]},
    "v2": {"x": [(0, 3), (3, 6), (6, 8)],
           "y": [(0, 3), (3, 6), (6, 8)],
           "z": [(0, 3), (3, 6), (6, 8)]},
    "v3": {"x": [(0, 3), (3, 5), (5, 7)],
           "y": [(0, 3), (3, 5), (5, 7)],
           "z": [(0, 2), (2, 4), (4, 6), (6, 8)]},
    "v4": {"x": [(0, 3), (3, 6), (6, 8)],
           "y": [(0, 3), (3, 6), (6, 8)],
           "z": [(0, 3), (3, 5), (5, 7)]},
}

Z_TO_SNAP = {0.0: 32, 0.125: 31, 0.25: 30, 0.375: 29, 0.5: 28, 0.75: 27,
             1.0: 26, 1.25: 25, 1.5: 24, 1.75: 23, 2.0: 22}

PROJ_INDEX = {"x": 0, "y": 1, "z": 2}


def read_sheets(path, n_sheet, n_grid):
    """Read a make_sheets output binary -> (3, n_sheet, n_grid, n_grid)."""
    flat = np.fromfile(path, dtype="<f4")
    expected = 3 * n_sheet * n_grid * n_grid
    if flat.size != expected:
        raise ValueError(f"{path}: expected {expected} values, got {flat.size}")
    # Fortran layout (3, n_sheet, m, m): first index fastest
    return flat.reshape(n_grid, n_grid, n_sheet, 3).T


def build_slices(sheets, scheme_for_volume):
    """Sum sheet ranges into per-depth slice images."""
    out = {"100": [], "150": []}
    for proj, ranges in scheme_for_volume.items():
        p = PROJ_INDEX[proj]
        for start, stop in ranges:
            depth = {2: "100", 3: "150"}.get(stop - start)
            if depth is None:
                raise ValueError(f"Only 2- or 3-sheet ranges supported, "
                                 f"got ({start}, {stop}).")
            out[depth].append(sheets[p, start:stop].sum(axis=0))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sheets-path", required=True,
                   help="directory with make_sheets outputs")
    p.add_argument("--name-template",
                   default="{volume}_snap{snap}_{field}_sheets",
                   help="sheet file name pattern within --sheets-path")
    p.add_argument("--output-path", required=True)
    p.add_argument("--fields", nargs="+", default=["dm", "pressure"])
    p.add_argument("--redshifts", nargs="+", type=float,
                   default=sorted(Z_TO_SNAP))
    p.add_argument("--n-sheet", type=int, default=8)
    p.add_argument("--n-grid", type=int, default=2048)
    p.add_argument("--scheme-json",
                   help="JSON file overriding the volume slicing scheme")
    p.add_argument("--name", default="train",
                   help="prefix of the files-info pickle")
    args = p.parse_args()

    scheme = DEFAULT_SCHEME
    if args.scheme_json:
        with open(args.scheme_json) as f:
            scheme = {v: {pr: [tuple(r) for r in ranges]
                          for pr, ranges in projs.items()}
                      for v, projs in json.load(f).items()}

    os.makedirs(args.output_path, exist_ok=True)
    files_info = []
    for field in args.fields:
        for z in args.redshifts:
            snap = Z_TO_SNAP.get(z)
            slices = {"100": [], "150": []}
            for volume, vol_scheme in scheme.items():
                fn = args.name_template.format(volume=volume, snap=snap,
                                               field=field, z=z)
                path = os.path.join(args.sheets_path, fn)
                sheets = read_sheets(path, args.n_sheet, args.n_grid)
                built = build_slices(sheets, vol_scheme)
                slices["100"].extend(built["100"])
                slices["150"].extend(built["150"])

            entry = {"field": field, "z": z}
            for depth in ("100", "150"):
                stack = np.stack(slices[depth]).astype(np.float32)
                out_name = f"{field}_z{z:.3f}_{depth}.npy"
                np.save(os.path.join(args.output_path, out_name), stack)
                entry[f"file_{depth}"] = out_name
                entry[f"mean_{depth}"] = float(stack.mean())
                entry[f"var_{depth}"] = float(stack.var())
                print(f"{out_name}: {stack.shape} mean={entry[f'mean_{depth}']:.4e}")
            files_info.append(entry)

    info_path = os.path.join(args.output_path,
                             f"{args.name}_files_info.pickle")
    with open(info_path, "wb") as f:
        pickle.dump(files_info, f)
    print(f"wrote {info_path} ({len(files_info)} entries)")


if __name__ == "__main__":
    main()
