#!/usr/bin/env python
"""Quantify the eval-noise floor of the P(k) fidelity gate.

VERDICT r4 weak 6 / next-round item 1: the physical-512 flagship's 0.1227
plateau is selected on ~48 validation tiles per redshift — if the gate
metric's sampling variance at the binding z-bin is a meaningful fraction
of the 0.05 gate, further chip-time sweeps would be tuning against noise.
This script measures that floor for a committed checkpoint:

  * paints N tiles per redshift (default 192 = 4x the standard eval),
  * computes the gate metric (median over k-bins of the |ratio-of-means
    fractional error|, exactly scripts/fidelity_check.py pk_errors) on
    the full N-tile sample,
  * bootstrap-resamples 48-tile subsets (paired painted/truth/dm tiles)
    to get the sampling distribution of the standard eval's per-z metric:
    sigma, central 90% interval, and P(metric > gate | true metric),
  * reports per (z, statistic) JSON to stdout (one line) for committing
    next to the checkpoint.

The bootstrap includes BOTH noise sources of a fresh eval — which tiles
were drawn AND the prior-sample randomness of the paint — because each
painted tile carries its own independent prior draw.

Run on the chip (a 512^2 11-z sweep paints ~2k tiles); CPU works for
small tiles. Chip etiquette: single-tenant, idle host for timing-free
accuracy work is not required (this is not a timing bench).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint base, e.g. "
                        "trained_models/CVAE/physical-512-lt-wip/model")
    p.add_argument("--workdir", default="/tmp/bpt_gate_var")
    p.add_argument("--n-tiles", type=int, default=192,
                   help="tiles painted per redshift (the reference eval "
                        "uses 48)")
    p.add_argument("--eval-n", type=int, default=48,
                   help="bootstrap subset size = the standard eval's "
                        "tile count")
    p.add_argument("--n-boot", type=int, default=400)
    p.add_argument("--redshifts", default=None,
                   help="comma list; default: the checkpoint's "
                        "fidelity_dataset geometry")
    p.add_argument("--dtype", default="model", choices=["model", "f32"],
                   help="paint dtype leg (f32 wraps matmuls in highest "
                        "precision — see fidelity_check.pk_errors)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gate", type=float, default=0.05)
    args = p.parse_args()

    import contextlib

    import jax
    import jax.numpy as jnp

    from baryon_painter_tpu.data.dataset import (BahamasTileDataset,
                                                 load_file_info)
    from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
    from baryon_painter_tpu.painter import CGANPainter, CVAEPainter
    from baryon_painter_tpu.power_spectrum import pseudo_pofk_2d
    from baryon_painter_tpu.transforms import transform_from_dict
    from baryon_painter_tpu.utils.platform import (enable_compilation_cache,
                                                   respect_env_platform)
    respect_env_platform()
    enable_compilation_cache()

    with open(args.checkpoint + "_meta.json") as f:
        meta = json.load(f)
    geom = meta.get("fidelity_dataset")
    if geom is None:
        raise SystemExit(f"{args.checkpoint}: no fidelity_dataset geometry "
                         f"in the meta; pass an explicitly seeded workdir")
    tile = int(geom["tile"])
    redshifts = tuple(
        float(s) for s in (args.redshifts or geom["redshifts"]).split(","))
    physical_kw = (dict(spectrum="powerlaw", sigma0=1.2, pressure_smooth=2.0,
                        pressure_noise_corr=2.0) if geom.get("physical")
                   else {})
    info = make_synthetic_stacks(
        args.workdir, n_stack=int(geom["n_stack"]), n_grid=2 * tile,
        redshifts=tuple(float(s) for s in geom["redshifts"].split(",")),
        seed=int(geom["seed"]), name="fid",
        pressure_noise=float(geom["pressure_noise"]), **physical_kw)
    transforms = {f: transform_from_dict(d)
                  for f, d in meta["transforms"].items()}
    # the gate's validation split: stack 0 (fidelity_check main)
    ds = BahamasTileDataset(files=load_file_info(info),
                            root_path=args.workdir, n_stack=1,
                            stack_offset=0, n_tile=2,
                            tile_permutations=True, transforms=transforms)

    # "model" = the training compute dtype (bf16 for every committed
    # checkpoint); "f32" = float32 input dtype + highest matmul precision
    cls = (CGANPainter if meta.get("model_kind") == "cgan" else CVAEPainter)
    painter = cls(args.checkpoint,
                  dtype=jnp.bfloat16 if args.dtype == "model" else None)
    is_cvae = cls is CVAEPainter
    log(f"devices: {jax.devices()}  checkpoint: {args.checkpoint}  "
        f"tile={tile}  n_tiles={args.n_tiles}  dtype={args.dtype}")

    ctx = (jax.default_matmul_precision("highest")
           if args.dtype == "f32" else contextlib.nullcontext())
    boot_rng = np.random.default_rng(12345)
    out_z = {}
    for z in redshifts:
        rng = np.random.default_rng(args.seed)
        idx = ds.sample_indices(rng, args.n_tiles, z=z)
        batch = ds.get_raw_batch(idx)
        truth = jnp.asarray(batch["labels"][0], jnp.float32)
        dm = jax.device_put(jnp.asarray(batch["input"], jnp.float32))
        zs = jnp.asarray(batch["z"], jnp.float32)
        with ctx:
            kw = ({"rng": jax.random.PRNGKey(args.seed)}
                  if is_cvae else {})
            painted = painter.paint_batch(dm, zs, **kw)
        painted = painted.astype(jnp.float32)
        # per-tile binned spectra (N, n_bins)
        pk_t, _, _, nm = pseudo_pofk_2d(truth, L=ds.tile_L, n_k_bin=12)
        pk_ct, *_ = pseudo_pofk_2d(truth, dm, L=ds.tile_L, n_k_bin=12)
        pk_p, *_ = pseudo_pofk_2d(painted, L=ds.tile_L, n_k_bin=12)
        pk_cp, *_ = pseudo_pofk_2d(painted, dm, L=ds.tile_L, n_k_bin=12)
        occ = np.asarray(nm) > 0
        pk_t, pk_ct = np.asarray(pk_t)[:, occ], np.asarray(pk_ct)[:, occ]
        pk_p, pk_cp = np.asarray(pk_p)[:, occ], np.asarray(pk_cp)[:, occ]

        def metric(sel):
            auto = np.abs(pk_p[sel].mean(0) / pk_t[sel].mean(0) - 1)
            cross = np.abs(pk_cp[sel].mean(0) / pk_ct[sel].mean(0) - 1)
            return (float(np.median(auto)), float(np.median(cross)))

        full_auto, full_cross = metric(slice(None))
        boots = np.array([
            metric(boot_rng.integers(0, args.n_tiles, args.eval_n))
            for _ in range(args.n_boot)])
        worst = boots.max(axis=1)
        q = np.percentile
        out_z[str(z)] = {
            "auto_full": round(full_auto, 4),
            "cross_full": round(full_cross, 4),
            "auto_boot_mean": round(float(boots[:, 0].mean()), 4),
            "auto_boot_sigma": round(float(boots[:, 0].std()), 4),
            "auto_boot_p5_p95": [round(float(q(boots[:, 0], 5)), 4),
                                 round(float(q(boots[:, 0], 95)), 4)],
            "cross_boot_sigma": round(float(boots[:, 1].std()), 4),
            "worst_boot_sigma": round(float(worst.std()), 4),
            "p_worst_gt_gate": round(float((worst > args.gate).mean()), 3),
        }
        log(f"z={z}: full(auto={full_auto:.4f}, cross={full_cross:.4f})  "
            f"boot@{args.eval_n}: auto {out_z[str(z)]['auto_boot_mean']}"
            f"±{out_z[str(z)]['auto_boot_sigma']} "
            f"[{out_z[str(z)]['auto_boot_p5_p95'][0]}, "
            f"{out_z[str(z)]['auto_boot_p5_p95'][1]}]")

    binding = max(out_z, key=lambda k: max(out_z[k]["auto_full"],
                                           out_z[k]["cross_full"]))
    rec = {
        "metric": "gate_eval_variance",
        "checkpoint": args.checkpoint,
        "n_tiles_full": args.n_tiles,
        "eval_n": args.eval_n,
        "n_boot": args.n_boot,
        "dtype": args.dtype,
        "gate": args.gate,
        "binding_z": binding,
        "binding_full": round(max(out_z[binding]["auto_full"],
                                  out_z[binding]["cross_full"]), 4),
        "binding_sigma_at_eval_n": out_z[binding]["worst_boot_sigma"],
        "per_z": out_z,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
