"""End-to-end smoke of the fidelity_check CLI surface.

Runs the real script (subprocess, tiny geometry) and locks in the report
contract the judge and the promotion tooling consume: the dual-dtype gate
fields, best-checkpoint artifacts, and checkpoint-meta-driven eval-only
reconstruction (no architecture flags needed).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "fidelity_check.py")

pytestmark = pytest.mark.slow  # two subprocesses, each compiles train+paint


def run_fidelity(args, tmp):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, SCRIPT, *args], env=env, cwd=str(tmp),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    return json.loads(lines[-1]), out.stderr


SMOKE = ["--tile", "32", "--redshifts", "0,1", "--n-stack", "2",
         "--batch", "4", "--scan", "5", "--seed", "3"]


def test_train_report_and_eval_only_contract(tmp_path):
    wd = str(tmp_path / "wd")
    rep, err = run_fidelity(
        SMOKE + ["--n-samples", "40", "--workdir", wd], tmp_path)
    # dual-dtype report contract (gate defaults to --gate-dtype both and
    # the CVAE trainer computes in bf16, so both legs must be present)
    assert rep["gate_dtype"] == "both"
    assert set(rep["per_z_by_dtype"]) == {"f32", "model"}
    for d in rep["per_z_by_dtype"].values():
        assert set(d) == {"0", "1"}
    # headline per_z is the portable-f32 leg
    assert rep["per_z"] == rep["per_z_by_dtype"]["f32"]
    # pass_5pct is the worst over dtypes and redshifts
    worst = max(v[k] for d in rep["per_z_by_dtype"].values()
                for v in d.values() for k in ("auto", "cross"))
    assert rep["pass_5pct"] == (worst < 0.05)
    ckpt = os.path.join(wd, "fidelity_model_cvae")
    assert os.path.exists(ckpt + "_state.msgpack")

    # eval-only rebuilds the model from the checkpoint meta (no arch flags)
    # and must reproduce the same f32 per-z numbers on the same stacks
    rep2, err2 = run_fidelity(
        SMOKE + ["--n-samples", "40", "--workdir", wd, "--eval-only"],
        tmp_path)
    assert rep2["n_samples"] == 0
    for z in ("0", "1"):
        np.testing.assert_allclose(
            rep2["per_z"][z]["auto"], rep["per_z"][z]["auto"], atol=2e-3)
    assert "restored checkpoint" in err2


def test_transform_flags_and_meta_override(tmp_path):
    """--dm/--pressure-transform select the training transforms; on
    restore the checkpoint meta's transforms win over the CLI flags (the
    gate must paint through what the model was trained with)."""
    wd = str(tmp_path / "wd")
    rep, err = run_fidelity(
        SMOKE + ["--n-samples", "20", "--workdir", wd,
                 "--pressure-transform", "log-tanh:8"], tmp_path)
    ckpt = os.path.join(wd, "fidelity_model_cvae")
    with open(ckpt + "_meta.json") as f:
        tf = json.load(f)["transforms"]
    assert tf["pressure"]["mode"] == "log-tanh"
    assert tf["pressure"]["k"] == 8.0
    assert tf["dm"]["mode"] == "shift-log"

    # eval-only with DEFAULT transform flags: meta must override
    rep2, err2 = run_fidelity(
        SMOKE + ["--workdir", wd, "--eval-only"], tmp_path)
    assert "using the checkpoint's transforms" in err2
    for z in ("0", "1"):
        np.testing.assert_allclose(
            rep2["per_z"][z]["auto"], rep["per_z"][z]["auto"], atol=2e-3)


def test_flag_validation_fails_fast(tmp_path):
    """Bad flag combinations must exit at parse time — before dataset
    synthesis, restore, or any paint-graph compile (each bad launch used to
    cost 10+ min of 512^2 TPU compile before the check fired)."""
    import time

    cases = [
        (["--z-boost", "auto", "--pk-loss-weight", "1", "--batch", "4",
          "--redshifts", "0,1"],                       # auto needs evals
         "needs --eval-every"),
        (["--z-boost", "0:2", "--pk-loss-weight", "1", "--batch", "5",
          "--redshifts", "0,1,2"],                     # 5 % (2+1+1) != 0
         "divisible by the total z shares"),
        (["--z-boost", "0:2", "--batch", "4", "--redshifts", "0,1"],
         "--z-boost only takes effect"),               # boost without pk
        (["--z-boost", "auto:1", "--pk-loss-weight", "1", "--batch", "4",
          "--redshifts", "0,1", "--eval-every", "5"],
         "K >= 2"),
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for extra, msg in cases:
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, SCRIPT, "--tile", "32", "--workdir",
             str(tmp_path / "wd"), *extra],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, timeout=120)
        assert out.returncode != 0, extra
        assert msg in out.stderr, (extra, out.stderr[-500:])
        # parse-time = import cost only; a compile would blow way past this
        assert time.time() - t0 < 60, extra
