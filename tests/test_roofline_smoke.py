"""Smoke test for scripts/roofline.py's measurement plumbing on CPU: the
report must be strict JSON with per-segment entries, floor-dominated
segments must withhold MFU/BW, and unknown segment names must be rejected."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "roofline.py")

pytestmark = pytest.mark.slow  # builds a (tiny) trainer; compile-heavy


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_roofline_report_is_strict_json(tmp_path):
    out = str(tmp_path / "roofline.json")
    res = subprocess.run(
        [sys.executable, SCRIPT, "--tile", "64", "--batch", "2",
         "--repeats", "2", "--segments", "gather,prepare", "--out", out],
        env=_env(), capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.load(open(out))  # json.load rejects bare NaN? no — check
    # strict-JSON check: the file must parse with NaN/Infinity forbidden
    json.loads(open(out).read(), parse_constant=lambda c: (_ for _ in ()
               ).throw(AssertionError(f"non-strict JSON constant {c}")))
    assert {"gather", "prepare", "fetch_floor"} <= set(report["segments"])
    for name in ("gather", "prepare"):
        seg = report["segments"][name]
        assert seg["ms"] >= 0
        if seg.get("floor_dominated"):
            assert seg["mfu_pct"] is None and seg["bw_pct"] is None
    # on CPU the peak tables have no entry: peaks must be null, not NaN
    assert report["peak_flops"] is None
    line = json.loads(res.stdout.strip().splitlines()[-1])
    assert line["metric"] in ("roofline_segments", "roofline_step_ms")


def test_roofline_rejects_unknown_segment():
    res = subprocess.run(
        [sys.executable, SCRIPT, "--segments", "gaher"],
        env=_env(), capture_output=True, text=True, timeout=120)
    assert res.returncode != 0
    assert "unknown segment" in res.stderr
