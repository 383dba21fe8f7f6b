"""bench.py stdout contract: exactly one JSON line with the driver's keys.

The round driver runs bench.py and records its single JSON line; a stray
print or a renamed key silently breaks the recorded benchmark, so pin the
contract with a tiny-shape run.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow  # compiles a (tiny) train step


def test_bench_stdout_is_one_json_record(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               BPT_BENCH_TILE="32", BPT_BENCH_BATCH="4", BPT_BENCH_STEPS="4",
               JAX_COMPILATION_CACHE_DIR=str(tmp_path / "cache"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        timeout=900)
    assert out.returncode == 0
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must carry ONLY the JSON line: {lines}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "cvae_train_samples_per_sec"
    assert rec["unit"] == "samples/s"
    assert rec["value"] > 0
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 14.0, rel=0.01)
    assert "error" not in rec
    # compile/steady split + paint-dispatch percentile fields (r4 bench
    # methodology: paint headline = p50 of scan-fused dispatches)
    assert rec["compile_s"] > 0 and rec["steady_ms_per_step"] > 0
    assert rec["paint_p50_ms"] > 0
    assert rec["paint_p95_ms"] >= rec["paint_p50_ms"]
    assert rec["paint_rep_spread"] >= 1.0
    assert rec["paint_tiles_per_sec"] > 0
