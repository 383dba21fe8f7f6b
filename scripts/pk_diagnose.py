#!/usr/bin/env python
"""Per-bin P(k) diagnostic for a fidelity checkpoint.

Loads the checkpoint saved by fidelity_check.py and prints, per redshift and
per k-bin, the painted/truth auto-P(k) ratio, the cross-P(k) ratio, and the
correlation coefficient r(k) = P_xd / sqrt(P_xx P_dd) of painted vs truth.
This separates "uncorrelated extra power" (auto high, r low) from
"miscalibrated amplitude" (auto off, r ~ 1) so the right fix is visible.

Reads the workdir layout produced by scripts/fidelity_check.py.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/bpt_fidelity")
    p.add_argument("--model", default="cvae", choices=["cvae", "cgan"])
    p.add_argument("--tile", type=int, default=256)
    p.add_argument("--upsample", default="transpose",
                   choices=["transpose", "resize"])
    p.add_argument("--n-sample", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from baryon_painter_tpu.utils.platform import (
        enable_compilation_cache, respect_env_platform)
    respect_env_platform()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from baryon_painter_tpu.data.dataset import (BahamasTileDataset,
                                                 load_file_info)
    from baryon_painter_tpu.models.cvae import (CVAE,
                                                fiducial_cvae_architecture)
    from baryon_painter_tpu.painter import CVAEPainter
    from baryon_painter_tpu.power_spectrum import pseudo_pofk_2d
    from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
    from baryon_painter_tpu.transforms import RangeCompress

    transforms = {"dm": RangeCompress("shift-log", 4.0, eps=1e-4),
                  "pressure": RangeCompress("shift-log", 4.0, eps=1e-4)}
    info_path = os.path.join(args.workdir, "fid_files_info.pickle")
    ds = BahamasTileDataset(files=load_file_info(info_path),
                            root_path=args.workdir, n_tile=2,
                            n_stack=1, stack_offset=0,
                            tile_permutations=True, transforms=transforms)
    arch = fiducial_cvae_architecture(tile_size=args.tile, n_res_blocks=4,
                                      upsample=args.upsample)
    trainer = CVAETrainer(CVAE(arch, dtype=jnp.bfloat16), ds,
                          config=TrainConfig(seed=args.seed))
    trainer.restore(os.path.join(args.workdir,
                                 f"fidelity_model_{args.model}"))
    painter = CVAEPainter.from_trainer(trainer)

    rng = np.random.default_rng(args.seed)
    report = {}
    for z in ds.redshifts:
        idx = ds.sample_indices(rng, args.n_sample, z=z)
        batch = ds.get_raw_batch(idx)
        truth = batch["labels"][0]
        dm = batch["input"]
        painted = np.asarray(painter.paint_batch(
            batch["input"], batch["z"], rng=jax.random.PRNGKey(args.seed)))
        pk_t, k, _, nm = pseudo_pofk_2d(truth, L=ds.tile_L, n_k_bin=12)
        pk_p, *_ = pseudo_pofk_2d(painted, L=ds.tile_L, n_k_bin=12)
        pk_ct, *_ = pseudo_pofk_2d(truth, dm, L=ds.tile_L, n_k_bin=12)
        pk_cp, *_ = pseudo_pofk_2d(painted, dm, L=ds.tile_L, n_k_bin=12)
        # correlation of painted against the truth field itself
        pk_x, *_ = pseudo_pofk_2d(painted, truth, L=ds.tile_L, n_k_bin=12)
        occ = np.asarray(nm) > 0
        k = np.asarray(k)[occ]
        a_t = np.asarray(pk_t).mean(0)[occ]
        a_p = np.asarray(pk_p).mean(0)[occ]
        c_t = np.asarray(pk_ct).mean(0)[occ]
        c_p = np.asarray(pk_cp).mean(0)[occ]
        x = np.asarray(pk_x).mean(0)[occ]
        r = x / np.sqrt(a_p * a_t)
        rows = []
        print(f"z={z:g}   k [h/Mpc]   auto_p/auto_t   cross_p/cross_t   r(k)")
        for i in range(len(k)):
            print(f"  {k[i]:10.3f}   {a_p[i] / a_t[i]:10.4f}   "
                  f"{c_p[i] / c_t[i]:12.4f}   {r[i]:7.4f}")
            rows.append({"k": float(k[i]),
                         "auto_ratio": float(a_p[i] / a_t[i]),
                         "cross_ratio": float(c_p[i] / c_t[i]),
                         "r": float(r[i])})
        report[f"{z:g}"] = rows
        print(f"  mean_ratio={painted.mean() / truth.mean():.4f} "
              f"std_ratio={painted.std() / truth.std():.4f}")
    print(json.dumps({"metric": "pk_per_bin", "per_z": report}))


if __name__ == "__main__":
    main()
