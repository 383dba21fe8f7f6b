#!/usr/bin/env python
"""Demonstration panels for the field transforms — the counterpart of the
reference's ``notebooks/data_transform_examples.ipynb``.

For a synthetic lognormal density field, applies each of the six invertible
range-compression modes (transforms.py, mirroring the reference's
data_transforms.py:66-108), plots the raw/transformed histograms side by
side, reports the forward->inverse roundtrip error per mode, and
demonstrates the split-scale (Gaussian-pyramid) transform's decomposition +
exact recomposition. One PNG + one JSON line.

    python scripts/transform_examples.py --out /tmp/transforms
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# mode-appropriate k values (the reference notebook's choices: the fiducial
# shift-log uses k=4; two-parameter modes take tuples)
MODE_KS = {
    "log": 4.0,
    "shift-log": 4.0,
    "shift-log-2p": (1.0, 4.0),
    "log-tanh": 4.0,
    "x/(1+x)": (2.0, 1.0),
    "1/x": 1.0,
}


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", default="/tmp/bpt_transform_examples",
                   help="output directory for the PNG + JSON")
    p.add_argument("--n", type=int, default=256, help="field size (n x n)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from baryon_painter_tpu.utils.platform import respect_env_platform
    respect_env_platform()
    import jax.numpy as jnp

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from baryon_painter_tpu.transforms import (FieldStats, RangeCompress,
                                               SplitScale)

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    # lognormal-ish positive field, same character as a density stack
    field = np.exp(1.2 * rng.standard_normal((args.n, args.n))).astype(
        np.float32)
    stats = FieldStats(z_grid=jnp.asarray([0.0, 1.0]),
                       mean=jnp.full(2, float(field.mean())),
                       var=jnp.full(2, float(field.var())))
    z = 0.5

    results = {}
    fig, axes = plt.subplots(2, len(MODE_KS), figsize=(3 * len(MODE_KS), 5),
                             squeeze=False)
    for i, (mode, k) in enumerate(MODE_KS.items()):
        tf = RangeCompress(mode, k)
        fwd = np.asarray(tf.forward(jnp.asarray(field), stats, z))
        back = np.asarray(tf.inverse(jnp.asarray(fwd), stats, z))
        err = float(np.max(np.abs(back - field) / (np.abs(field) + 1e-6)))
        results[mode] = {"roundtrip_max_rel_err": err,
                         "fwd_range": [float(fwd.min()), float(fwd.max())]}
        axes[0][i].hist(np.log10(field.reshape(-1)), bins=80, color="C0")
        axes[0][i].set_title(f"log10(x)  —  {mode}", fontsize=9)
        axes[1][i].hist(fwd.reshape(-1), bins=80, color="C1")
        axes[1][i].set_title(f"T(x), roundtrip {err:.1e}", fontsize=9)
    fig.tight_layout()
    png = os.path.join(args.out, "range_compress_modes.png")
    fig.savefig(png, dpi=110)
    plt.close(fig)

    # split-scale decomposition + exact recomposition
    ss = SplitScale(n_scale=3)
    parts = np.asarray(ss.forward(jnp.asarray(field[None])))
    recomposed = np.asarray(ss.inverse(jnp.asarray(parts)))[0]
    ss_err = float(np.max(np.abs(recomposed - field)
                          / (np.abs(field) + 1e-6)))
    results["split-scale"] = {"n_scale": 3,
                              "recompose_max_rel_err": ss_err}

    fig, axes = plt.subplots(1, parts.shape[1] + 1,
                             figsize=(3 * (parts.shape[1] + 1), 3))
    axes[0].imshow(np.log10(field), cmap="magma")
    axes[0].set_title("log10 original", fontsize=9)
    for c in range(parts.shape[1]):
        axes[c + 1].imshow(parts[0, c], cmap="magma")
        axes[c + 1].set_title(f"scale {c}", fontsize=9)
    for ax in axes:
        ax.set_xticks([]), ax.set_yticks([])
    fig.tight_layout()
    png2 = os.path.join(args.out, "split_scale.png")
    fig.savefig(png2, dpi=110)
    plt.close(fig)

    report = {"metric": "transform_examples", "out": args.out,
              "figures": [os.path.basename(png), os.path.basename(png2)],
              "modes": results}
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
