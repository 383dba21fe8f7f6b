#!/usr/bin/env python
"""Promote a fidelity-run checkpoint from its workdir into trained_models/.

Collects the artifact set every committed model directory carries
(checkpoint pair, reference-format stats streams, figures, fidelity
report), re-evaluates the gate from the copied checkpoint for provenance,
and regenerates ``report.md`` — so promotion is one audited command instead
of an error-prone manual copy.

    python scripts/promote_checkpoint.py --workdir /tmp/bpt_fid_cgan_r3 \
        --model cgan --dest trained_models/CGAN/fiducial-resize \
        --eval-args "--tile 512 --redshifts 0,...,2 --n-stack 4 --upsample resize"

``--eval-args`` are passed through to fidelity_check.py --eval-only; they
must reproduce the run's dataset geometry (the same flags the training
phases used; see trained_models/README.md recipes).
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

SCRIPTS = os.path.dirname(os.path.abspath(__file__))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--workdir", required=True)
    p.add_argument("--model", required=True, choices=["cvae", "cgan"])
    p.add_argument("--dest", required=True,
                   help="target directory under trained_models/")
    p.add_argument("--eval-args", default="",
                   help="extra fidelity_check.py flags reproducing the "
                        "run's dataset geometry for the --eval-only pass")
    p.add_argument("--skip-eval", action="store_true",
                   help="copy artifacts without the re-evaluation pass "
                        "(no fidelity_report.json provenance)")
    args = p.parse_args(argv)

    ckpt = os.path.join(args.workdir, f"fidelity_model_{args.model}")
    if not os.path.exists(ckpt + "_state.msgpack"):
        raise SystemExit(f"no checkpoint at {ckpt}_state.msgpack")
    os.makedirs(args.dest, exist_ok=True)

    copied = []

    def take(src, dst_name):
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(args.dest, dst_name))
            copied.append(dst_name)

    take(ckpt + "_state.msgpack", "model_state.msgpack")
    take(ckpt + "_meta.json", "model_meta.json")
    take(os.path.join(args.workdir, f"training_stats_{args.model}.txt"),
         "training_stats.txt")
    take(os.path.join(args.workdir, f"training_stats_{args.model}_pkft.txt"),
         "training_stats_pkft.txt")
    for fig in ("sample", "auto_power_spectrum", "log_histogram"):
        take(os.path.join(args.workdir, f"{args.model}_{fig}.png"),
             f"{args.model}_{fig}.png")

    if not args.skip_eval:
        cmd = [sys.executable, os.path.join(SCRIPTS, "fidelity_check.py"),
               "--model", args.model, "--eval-only",
               "--checkpoint", os.path.join(args.dest, "model"),
               "--workdir", args.workdir, *args.eval_args.split()]
        print("re-evaluating:", " ".join(cmd), file=sys.stderr, flush=True)
        out = subprocess.run(cmd, check=True, capture_output=True, text=True)
        report = json.loads(out.stdout.strip().splitlines()[-1])
        with open(os.path.join(args.dest, "fidelity_report.json"), "w") as f:
            json.dump(report, f, indent=1)
        copied.append("fidelity_report.json")
        print(f"gate: pass_5pct={report['pass_5pct']} "
              f"(auto={report['auto']}, cross={report['cross']})",
              file=sys.stderr, flush=True)

    # report.md from whatever now sits in the directory
    subprocess.run([sys.executable,
                    os.path.join(SCRIPTS, "make_model_report.py"),
                    args.dest], check=True)
    copied.append("report.md")
    print(json.dumps({"dest": args.dest, "files": copied}))


if __name__ == "__main__":
    main()
