#!/usr/bin/env python
"""Multi-host lightcone fan-out over DCN.

In-framework replacement for the SLURM-array pattern: launch one process per
host with jax.distributed coordinates (or under SLURM with srun), and each
process paints the lines of sight congruent to its process index.

    python scripts/lightcone_fanout.py --los 74 75 76 77 ... \
        --coordinator host0:1234 --num-processes 4 --process-id $RANK ...
"""
import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from baryon_painter_tpu.utils.platform import (
        enable_compilation_cache, respect_env_platform)
    respect_env_platform()
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--los", nargs="+", type=int, required=True)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (jax.distributed)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--output-base", default="y_map")
    args, passthrough = p.parse_known_args()

    from baryon_painter_tpu.parallel.mesh import initialize_multihost

    if args.coordinator is not None:
        initialize_multihost(args.coordinator, args.num_processes,
                             args.process_id)
        import jax
        pid, nproc = jax.process_index(), jax.process_count()
    else:
        pid = args.process_id or 0
        nproc = args.num_processes or 1

    mine = args.los[pid::nproc]
    print(f"process {pid}/{nproc}: painting LOS {mine}")
    for los in mine:
        cmd = [sys.executable,
               os.path.join(os.path.dirname(__file__), "create_lightcone.py"),
               "--SLICS-LOS", str(los),
               "--output-file", f"{args.output_base}_LOS{los}",
               *passthrough]
        subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
