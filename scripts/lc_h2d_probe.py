#!/usr/bin/env python
"""Probe: does tunnel H2D overlap device compute?

LIGHTCONE_r03 measured steady LOS ~= per-shell compute + per-plane H2D,
i.e. the prefetch thread's device_put did NOT hide behind painting. This
probe measures the three primitives on the real chip:

  1. paint-only: seamless paint of an HBM-resident plane
  2. h2d-only:   upload of a 7745^2 (bf16) delta plane
  3. overlapped: paint on the main thread while a worker uploads

and reports the overlap efficiency
  eff = (t_paint + t_h2d - t_both) / min(t_paint, t_h2d)
(1.0 = fully hidden, 0.0 = fully serialized). Also probes a chunked
upload (8 row slabs) in case the serialization is at RPC granularity.

Run on an otherwise idle host (tunnel timing is contention-sensitive).
Prints one JSON line.
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from baryon_painter_tpu.utils.platform import (enable_compilation_cache,
                                                   respect_env_platform)
    respect_env_platform()
    enable_compilation_cache()

    from baryon_painter_tpu.lightcone.pipeline import paint_plane_seamless
    from baryon_painter_tpu.painter import CVAEPainter

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    painter = CVAEPainter(os.path.join(repo, "trained_models", "CVAE",
                                       "fiducial-512", "model"),
                          dtype=jnp.bfloat16)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    n_px = int(os.environ.get("BPT_PROBE_PLANE", "2140"))
    plane = jnp.asarray(np.random.default_rng(0)
                        .gamma(2.0, 0.5, size=(n_px, n_px)), jnp.float32)

    def paint():
        # device compute with the plane already in HBM; sync by value
        out = paint_plane_seamless(painter, plane, 1.0, 100.0,
                                   100.0 * n_px / 512, 512,
                                   device_output=True)
        return float(out.mean())

    host_plane = np.random.default_rng(1).standard_normal(
        (7745, 7745)).astype(jnp.bfloat16)

    def h2d():
        d = jax.device_put(host_plane)
        return float(d[0, 0])  # sync by value (tunnel-safe)

    def h2d_chunked(k=8):
        rows = np.array_split(host_plane, k)
        parts = [jax.device_put(r) for r in rows]
        return float(parts[-1][0, 0])

    # compile / warm every path
    paint(); h2d(); h2d_chunked()

    def timed(fn, n=3):
        ts = []
        for _ in range(n):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return float(np.median(ts))

    t_paint = timed(paint)
    t_h2d = timed(h2d)
    t_h2d_chunk = timed(h2d_chunked)

    def overlapped(upload):
        err = []

        def worker():
            try:
                upload()
            except Exception as e:  # surface thread failures in the JSON
                err.append(repr(e))

        th = threading.Thread(target=worker)
        t0 = time.time()
        th.start()
        paint()
        th.join()
        if err:
            raise RuntimeError(err[0])
        return time.time() - t0

    t_both = float(np.median([overlapped(h2d) for _ in range(3)]))
    t_both_chunk = float(np.median([overlapped(h2d_chunked)
                                    for _ in range(3)]))

    def eff(t):
        return (t_paint + t_h2d - t) / max(1e-9, min(t_paint, t_h2d))

    print(json.dumps({
        "metric": "lc_h2d_overlap",
        "plane_px": n_px,
        "paint_s": round(t_paint, 3),
        "h2d_s": round(t_h2d, 3),
        "h2d_chunked_s": round(t_h2d_chunk, 3),
        "overlapped_s": round(t_both, 3),
        "overlapped_chunked_s": round(t_both_chunk, 3),
        "overlap_eff": round(eff(t_both), 3),
        "overlap_eff_chunked": round(eff(t_both_chunk), 3),
    }))


if __name__ == "__main__":
    main()
