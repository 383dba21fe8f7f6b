#!/usr/bin/env python
"""Is whole-plane (seamless) painting already at the HBM roofline?

VERDICT r4 weak 5: the production lightcone path is seamless
(LIGHTCONE_r04: seamless=true), but the 2.1x fused Pallas inference
res-block only serves the tile-batch path — `lightcone/pipeline.py`
fail-fasts on seamless+fused because the fused kernels specialize on
spatial shape (15 plane sizes per LOS = 15 multi-minute Mosaic
recompiles with the round-4 kernels). Before generalizing the kernel,
measure whether the XLA whole-plane decode leaves anything on the table:

  * paint a production-size plane R times through paint_plane (the exact
    seamless engine), sync by value; device time via the K-slope (K=1 vs
    K=4 paints per dispatch) so tunnel latency cancels,
  * compute the decode's HBM byte movement from XLA cost analysis of the
    lowered whole-plane graph,
  * report achieved bytes/s vs the chip's peak HBM bandwidth.

If achieved BW is already near the measured-practical ceiling (~85% of
peak, what the train step achieves), the fused path has no seamless
headroom and the tile-batch-only design is closed by measurement.

Run chip-idle (timing bench).
"""
import argparse
import json
import os
import sys
import time

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
    p.add_argument("--checkpoint",
                   default="trained_models/CVAE/fiducial-512/model")
    p.add_argument("--plane", type=int, default=2144,
                   help="plane pixels (r4 lc probe shell was 2140^2; use "
                        "a multiple of 8)")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--z", type=float, default=1.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from baryon_painter_tpu.painter import CVAEPainter
    from baryon_painter_tpu.parallel import spatial
    from baryon_painter_tpu.utils.platform import (enable_compilation_cache,
                                                   respect_env_platform)
    from baryon_painter_tpu.utils.profiling import (device_peak_bandwidth,
                                                    xla_cost)
    respect_env_platform()
    enable_compilation_cache()

    painter = CVAEPainter(args.checkpoint, dtype=jnp.bfloat16)
    n = args.plane
    rng = np.random.default_rng(0)
    g = rng.standard_normal((n, n)).astype(np.float32)
    plane = jax.device_put(jnp.asarray(np.exp(0.5 * g), jnp.float32))
    key = jax.random.PRNGKey(3)
    log(f"devices: {jax.devices()}  plane {n}^2  ckpt {args.checkpoint}")

    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def paint_k(key, k):
        def body(acc, i):
            out = spatial.paint_plane(painter, plane, args.z,
                                      rng=jax.random.fold_in(key, i))
            return acc + out.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(k))
        return acc

    results = {}
    for k in (1, 4):
        t0 = time.time()
        float(paint_k(key, k))
        results[f"compile_k{k}_s"] = round(time.time() - t0, 1)
        ms = []
        for r in range(args.reps):
            t0 = time.time()
            float(paint_k(jax.random.fold_in(key, 50 + r), k))
            ms.append((time.time() - t0) * 1e3)
        results[f"min_ms_k{k}"] = round(min(ms), 1)
        results[f"p50_ms_k{k}"] = round(float(np.percentile(ms, 50)), 1)
        log(f"K={k}: compile {results[f'compile_k{k}_s']}s "
            f"min {results[f'min_ms_k{k}']}ms p50 {results[f'p50_ms_k{k}']}ms")

    device_ms = (results["min_ms_k4"] - results["min_ms_k1"]) / 3
    try:
        lowered = jax.jit(lambda key: spatial.paint_plane(
            painter, plane, args.z, rng=key)).lower(key)
        flops, bytes_ = xla_cost(lowered.compile())
    except Exception as e:
        log(f"cost analysis unavailable: {e}")
        flops = bytes_ = float("nan")
    peak_bw = device_peak_bandwidth(jax.devices()[0])
    achieved_bw = bytes_ / (device_ms / 1e3)
    rec = {
        "metric": "seamless_paint_roofline",
        "plane": n,
        "z": args.z,
        "checkpoint": args.checkpoint,
        "device_ms_per_plane": round(device_ms, 1),
        "plane_bytes": None if np.isnan(bytes_) else bytes_,
        "plane_flops": None if np.isnan(flops) else flops,
        "peak_bw": peak_bw,
        "achieved_bw_frac": (None if np.isnan(bytes_)
                             else round(achieved_bw / peak_bw, 3)),
        "practical_bw_frac_train_step": 0.846,
        **results,
    }
    log(f"device {device_ms:.1f} ms/plane, bytes {bytes_:.3e} -> "
        f"{100 * achieved_bw / peak_bw:.1f}% of peak HBM BW "
        f"(train step achieves 84.6%)")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
