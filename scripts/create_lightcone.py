#!/usr/bin/env python
"""SLICS lightcone painting CLI.

Reference-parity flags (scripts/create_lightcone.py:13-33) plus multi-host
fan-out: with jax.distributed initialized, each process paints the LOS
congruent to its process index (replacing the SLURM-array pattern,
scripts/lightcone_slurm_sbatch.sh).
"""
import argparse
import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from baryon_painter_tpu.utils.platform import (
        enable_compilation_cache, respect_env_platform)
    respect_env_platform()
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-type", default="CVAE",
                        choices=["CVAE", "CGAN"])
    parser.add_argument("--CVAE-path")
    parser.add_argument("--CGAN-path")
    parser.add_argument("--SLICS-base-path", required=True)
    parser.add_argument("--SLICS-LOS", required=True)
    parser.add_argument("--n-plane", default=15, type=int)
    parser.add_argument("--tile-overlap", default=0.2, type=float)
    parser.add_argument("--output-resolution", default=7745 // 5, type=int)
    parser.add_argument("--drop-planes")
    parser.add_argument("--output-file", required=True)
    parser.add_argument("--output-file-planes")
    parser.add_argument("--paint-batch-size", default=16, type=int)
    parser.add_argument("--mesh-devices", default=0, type=int,
                        help="shard every shell's tile batch over this many "
                             "local devices (0 = single device)")
    parser.add_argument("--paint-dtype", default=None,
                        choices=["bf16", "f32"],
                        help="conv compute dtype for painting. Default "
                             "matches each model's committed fidelity-gate "
                             "provenance: bf16 for the CVAE (~2x faster on "
                             "TPU), f32 for the CGAN (its gate is computed "
                             "in f32, scripts/fidelity_check.py)")
    parser.add_argument("--fused-paint", action="store_true",
                        help="convert canonical residual blocks to the "
                             "fused Pallas inference kernel (CGAN: also "
                             "folds spectral norm into the weights; same "
                             "function, fewer HBM round trips)")
    parser.add_argument("--seamless", action="store_true",
                        help="paint each high-z shell as one fully-"
                             "convolutional pass over the whole zoomed "
                             "plane (halo-exchange sharded over "
                             "--mesh-devices) instead of overlap-tiling + "
                             "weight blending — no seams, every pixel "
                             "painted once")
    parser.add_argument("--bf16-transfer", action="store_true",
                        help="ship SLICS planes to the device as bfloat16 "
                             "(halves H2D bytes; promoted to f32 on device)")
    parser.add_argument("--kappa-path", default=None,
                        help="directory of SLICS convergence maps "
                             "(kappa_<survey>_tomo<i>.dat_LOS<los>); when "
                             "given, also compute the y x kappa pseudo-Cl "
                             "cross-spectrum (the reference paper's headline "
                             "statistic, create_lightcones.ipynb) and save "
                             "it to <output-file>_y_x_kappa.npz")
    parser.add_argument("--kappa-survey", default="KiDS450")
    parser.add_argument("--kappa-tomo", default=0, type=int)
    args = parser.parse_args()

    from baryon_painter_tpu.cosmology import SLICS_COSMOLOGY
    from baryon_painter_tpu.lightcone import create_y_map, process_slics
    from baryon_painter_tpu.painter import CGANPainter, CVAEPainter

    import jax.numpy as jnp
    if args.paint_dtype is None:
        args.paint_dtype = "bf16" if args.model_type == "CVAE" else "f32"
    paint_dtype = jnp.bfloat16 if args.paint_dtype == "bf16" else None
    if args.model_type == "CVAE":
        print("Using CVAE.")
        base = args.CVAE_path
        painter = CVAEPainter(os.path.join(base, "model"),
                              fused_inference=args.fused_paint,
                              dtype=paint_dtype)
    else:
        print("Using CGAN.")
        painter = CGANPainter(os.path.join(args.CGAN_path, "model"),
                              fused_inference=args.fused_paint,
                              dtype=paint_dtype)

    LOS = int(args.SLICS_LOS)
    delta_path = os.path.join(args.SLICS_base_path, "delta")
    massplane_path = os.path.join(args.SLICS_base_path, "massplanes")
    shifts_path = os.path.join(args.SLICS_base_path, "random_shifts")

    delta_files = glob.glob(
        os.path.join(delta_path, f"*delta.dat_bicubic_LOS{LOS}"))
    if not delta_files:
        raise RuntimeError(f"LOS {LOS} isn't complete.")
    z_SLICS = np.array(sorted(
        float(os.path.split(f)[1].split("delta")[0]) for f in delta_files))
    print("SLICS redshifts:", z_SLICS)

    cosmo = SLICS_COSMOLOGY()
    h = cosmo.h
    d_A_SLICS = cosmo.comoving_angular_distance(z_SLICS) * h  # Mpc/h
    z_slice = np.array([cosmo.redshift_of_chi(252.5 / h * i)
                        for i in range(len(z_SLICS))])

    n_z = args.n_plane
    print(f"Painting {n_z} of {len(z_SLICS)} planes, "
          f"overlap {args.tile_overlap}.")

    mesh = None
    if args.mesh_devices:
        from baryon_painter_tpu.parallel.mesh import data_parallel_mesh
        mesh = data_parallel_mesh(args.mesh_devices)
        print(f"Sharding tile batches over {mesh.size} devices.")
    transfer_dtype = None
    if args.bf16_transfer:
        import jax.numpy as jnp
        transfer_dtype = jnp.bfloat16

    painted_planes = process_slics(
        painter, tile_size=100.0, n_pixel_tile=512, LOS=LOS,
        z_SLICS=z_SLICS[:n_z],
        delta_size=d_A_SLICS[:n_z] * 10 / 180 * np.pi,
        delta_path=delta_path, massplane_path=massplane_path,
        shifts_path=shifts_path, z_slice=z_slice[:n_z],
        min_tiling_overlap=args.tile_overlap,
        paint_batch_size=args.paint_batch_size,
        mesh=mesh, transfer_dtype=transfer_dtype, seamless=args.seamless,
        # keep painted planes on device unless they are written to disk:
        # create_y_map computes on device, so numpy planes would pay a
        # ~0.5 GB/LOS D2H + H2D round trip for nothing
        device_output=not args.output_file_planes)

    res = args.output_resolution
    y_map = create_y_map(painted_planes, z_SLICS[:n_z], resolution=res,
                         map_size=10.0, cosmo=cosmo, order=5)
    np.save(args.output_file, y_map)
    if args.drop_planes is not None:
        n_drop = int(args.drop_planes)
        y_drop = create_y_map(painted_planes[n_drop:], z_SLICS[n_drop:n_z],
                              resolution=res, map_size=10.0, cosmo=cosmo,
                              order=5)
        np.save(args.output_file + f"_drop_{n_drop}", y_drop)
    if args.output_file_planes is not None:
        with open(args.output_file_planes, "wb") as f:
            pickle.dump(painted_planes, f)

    if args.kappa_path is not None:
        import jax.numpy as jnp

        from baryon_painter_tpu.angular_power import pseudo_cl_2d
        from baryon_painter_tpu.lightcone.io import (kappa_filename,
                                                     load_kappa_map)
        from baryon_painter_tpu.ops.resample import zoom as bspline_zoom
        kappa = load_kappa_map(kappa_filename(
            args.kappa_path, LOS, args.kappa_survey, args.kappa_tomo))
        if kappa.shape[0] != res:
            # bring kappa to the y-map grid (notebook-style decimation is a
            # special case; B-spline order 1 handles any ratio)
            kappa = np.asarray(bspline_zoom(
                jnp.asarray(kappa), res / kappa.shape[0], order=1))
        cl, ell, cl_var, n_mode = pseudo_cl_2d(
            jnp.asarray(y_map), jnp.asarray(kappa), theta_deg=10.0)
        out = args.output_file + "_y_x_kappa.npz"
        np.savez(out, cl=np.asarray(cl), ell=np.asarray(ell),
                 cl_var=np.asarray(cl_var), n_mode=np.asarray(n_mode))
        print(f"y x kappa cross-Cl saved to {out}")


if __name__ == "__main__":
    main()
