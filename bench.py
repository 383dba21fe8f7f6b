"""Headline benchmark: CVAE training throughput on 512^2 tiles.

Prints ONE JSON line:
  {"metric": "cvae_train_samples_per_sec", "value": N, "unit": "samples/s",
   "vs_baseline": N / 14.0}

Baseline: the reference trains ~14 samples/s on a GTX 1080 Ti
(trained_models/README.md:10; BASELINE.md). Same workload here: fiducial
~1.7M-param CVAE, 512^2 DM->pressure tiles, batch 24 (the reference's max),
full fused step (on-device shift-log transforms -> ELBO -> adam update).

All diagnostics go to stderr; stdout carries only the JSON line.
"""
import json
import os
import sys
import tempfile
import time
from functools import partial

# Persistent compile cache lives INSIDE the repo (gitignored): /tmp is wiped
# by the VM restarts between driver rounds, which is exactly when the driver
# re-runs this bench — a /tmp cache made every driver run a ~15 min cold
# compile (BENCH_r03 first dispatch: 891.8 s) while looking warm in-session.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def backend_unreachable(timeout_s: float = 180.0):
    """A reason string when auto backend init would hang or crash this
    process, or None when the backend is usable.

    The session TPU (axon tunnel) has been observed to wedge for hours with
    TCP still connecting — `jax.devices()` then blocks forever, and a bench
    that hangs is worse than one that reports the outage. Probe in a
    subprocess (which inherits the same sitecustomize/auto-registration)
    with a hard timeout. Only skipped for an explicit CPU override
    (JAX_PLATFORMS=cpu) — note TPU sessions ship with JAX_PLATFORMS=axon
    already set, so "set" does not mean "safe".
    """
    import subprocess
    try:
        subprocess.run([sys.executable, "-c", "import jax; jax.devices()"],
                       timeout=timeout_s, check=True,
                       stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)
        return None
    except subprocess.TimeoutExpired:
        return "device init timed out (tunnel wedged?)"
    except subprocess.CalledProcessError as e:
        # a crashed probe is NOT a tunnel outage — surface the real error
        # (import conflict, backend plugin crash) instead of misfiling it
        tail = (e.stderr or b"").decode(errors="replace").strip()
        return "probe crashed: " + (tail.splitlines()[-1] if tail
                                    else f"exit {e.returncode}")


def main():
    reason = (backend_unreachable()
              if os.environ.get("JAX_PLATFORMS", "") != "cpu" else None)
    if reason:
        log(f"bench: TPU backend unusable ({reason}) — emitting error "
            "record instead of hanging")
        print(json.dumps({
            "metric": "cvae_train_samples_per_sec", "value": 0.0,
            "unit": "samples/s", "vs_baseline": 0.0,
            "error": f"TPU backend unusable: {reason}; "
                     "not a performance regression — see ROUNDLOG.md"}))
        return

    import jax

    from baryon_painter_tpu.utils.platform import respect_env_platform
    respect_env_platform()  # lets JAX_PLATFORMS=cpu override the TPU backend
    from baryon_painter_tpu.data.dataset import (BahamasTileDataset,
                                                 load_file_info)
    from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
    from baryon_painter_tpu.models.cvae import (CVAE,
                                                fiducial_cvae_architecture)
    from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
    from baryon_painter_tpu.transforms import RangeCompress

    tile = int(os.environ.get("BPT_BENCH_TILE", "512"))
    batch = int(os.environ.get("BPT_BENCH_BATCH", "24"))
    n_steps = int(os.environ.get("BPT_BENCH_STEPS", "100"))
    dtype_name = os.environ.get("BPT_BENCH_DTYPE", "bfloat16")
    dtype = {"bfloat16": jax.numpy.bfloat16,
             "float32": jax.numpy.float32}[dtype_name]

    log(f"bench: devices={jax.devices()} tile={tile} batch={batch} "
        f"dtype={dtype_name}")

    root = tempfile.mkdtemp()
    info = make_synthetic_stacks(root, n_stack=2, n_grid=2 * tile,
                                 redshifts=(0.0, 1.0), seed=0)
    ds = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        tile_permutations=True,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    assert ds.tile_size == tile

    arch = fiducial_cvae_architecture(tile_size=tile, n_res_blocks=4)
    # Device-resident data path: stacks live in HBM, samples are assembled
    # inside the jit step; the host only ships (B, 9) int32 index digits.
    trainer = CVAETrainer(CVAE(arch, dtype=dtype), ds,
                          config=TrainConfig(seed=0), device_data=True)
    log(f"device stack cache: "
        f"{trainer.device_cache.nbytes(ds) / 1e6:.0f} MB in HBM")

    rng = np.random.default_rng(1)
    scan_k = int(os.environ.get("BPT_BENCH_SCAN", "25"))

    def idx_matrix(k):
        return np.stack([ds.sample_indices(rng, batch) for _ in range(k)])

    # --- first-dispatch floor probe (VERDICT r4 weak 3 / item 6) -------
    # Split the warm first dispatch into lower / compile / first-exec on
    # an AOT object at the exact step_scan shapes, so the ~2 min residual
    # is attributed by measurement instead of assertion. The subsequent
    # step_scan compile is a persistent-cache hit; if ITS first call still
    # pays ~the same as floor_compile_s, the cost is per-executable
    # backend load (each jit compilation loads its executable into the
    # tunneled backend), not recompilation.
    floor = {}
    if os.environ.get("BPT_BENCH_FLOOR", "1") == "1":
        import jax.numpy as _jnp
        aot_args = (trainer.state, trainer.device_cache.stacks,
                    (_jnp.zeros((scan_k, batch, 9), _jnp.int32),
                     _jnp.arange(scan_k)),
                    __import__("jax").random.PRNGKey(0),
                    _jnp.full((scan_k,), 1e-3, _jnp.float32),
                    _jnp.ones((scan_k,), _jnp.float32),
                    _jnp.ones((scan_k,), _jnp.float32))
        t0 = time.time()
        lowered = trainer._train_scan.lower(*aot_args)
        floor["floor_lower_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        compiled = lowered.compile()
        floor["floor_compile_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out = compiled(*aot_args)
        float(out[1]["elbo"][-1])  # sync by value
        floor["floor_first_exec_s"] = round(time.time() - t0, 2)
        # _train_scan donates the state argument: the probe consumed the
        # trainer's state buffers, so adopt the stepped state it returned
        trainer.state = out[0]
        log(f"first-dispatch floor: lower={floor['floor_lower_s']}s "
            f"compile(+load)={floor['floor_compile_s']}s "
            f"first_exec={floor['floor_first_exec_s']}s")

    t0 = time.time()
    m = trainer.step_scan(idx_matrix(scan_k), lr=1e-3)
    elbo = float(m["elbo"][-1])
    train_compile_s = time.time() - t0
    log(f"first scan ({scan_k} steps, compile): {train_compile_s:.1f}s "
        f"elbo={elbo:.4e}")
    assert np.isfinite(elbo), "non-finite ELBO"
    m = trainer.step_scan(idx_matrix(scan_k), lr=1e-3)  # warmup
    float(m["elbo"][-1])

    # BPT_BENCH_PROFILE=<dir> wraps the timed loop in a jax.profiler device
    # trace; per-dispatch wall times always go through StepTimer.
    from baryon_painter_tpu.utils.profiling import StepTimer, device_trace

    timer = StepTimer(skip_first=0)
    n_scans = max(1, n_steps // scan_k)
    with device_trace(os.environ.get("BPT_BENCH_PROFILE")):
        # t0/dt live INSIDE the trace region: start_trace and the blocking
        # trace dump at stop_trace must not be charged to the timed window
        t0 = time.time()
        for _ in range(n_scans):
            with timer:
                m = trainer.step_scan(idx_matrix(scan_k), lr=1e-3)
        elbo = float(m["elbo"][-1])  # blocks on the whole chain
        dt = time.time() - t0
    n_steps = n_scans * scan_k
    log(f"per-dispatch ({scan_k} steps each): {timer.summary()}")

    assert np.isfinite(elbo), "non-finite ELBO after timed steps"
    samples_per_sec = n_steps * batch / dt
    log(f"steady: {dt / n_steps * 1000:.1f} ms/step -> "
        f"{samples_per_sec:.1f} samples/s (elbo={elbo:.4e})")

    # Paint throughput — BASELINE.md's other headline ("512^2 tiles
    # painted/sec/chip"): prior-sample + decode + inverse transform through
    # the production paint_batch path. Tiles are staged in HBM first so the
    # number measures the chip, not the (possibly tunneled) host link.
    #
    # Methodology (VERDICT r3 weak 2 — the r3 number was irreproducible,
    # 160.6 vs 476.5 tiles/s between runs of the same bench): K paints are
    # fused into ONE lax.scan dispatch (mirroring step_scan), so tunnel
    # dispatch latency and host jitter are paid once per K batches instead
    # of once per batch, and the dispatch is repeated R times with a value
    # sync each — the headline is the p50 over repetitions, with p95 and
    # the max/min spread reported so a noisy host is visible in the JSON.
    import jax.numpy as jnp
    from baryon_painter_tpu.painter import CVAEPainter
    # fused Pallas residual blocks are the production painting path
    # (models/fuse.py; bit-equal tiles, flag-gated XLA fallback off-TPU);
    # BPT_BENCH_PAINT_FUSED=0 measures the plain path instead
    paint_fused = os.environ.get("BPT_BENCH_PAINT_FUSED", "1") == "1"
    painter = CVAEPainter.from_trainer(trainer, fused_inference=paint_fused)
    pb = int(os.environ.get("BPT_BENCH_PAINT_BATCH", str(batch)))
    raw = ds.get_raw_batch(ds.sample_indices(rng, pb))
    dm = jax.device_put(jnp.asarray(raw["input"], jnp.float32))
    zs = jax.device_put(jnp.asarray(raw["z"], jnp.float32))
    key = jax.random.PRNGKey(2)
    paint_k = int(os.environ.get("BPT_BENCH_PAINT_SCAN", "8"))
    n_reps = int(os.environ.get("BPT_BENCH_PAINT_REPS", "5"))

    @partial(jax.jit, static_argnames=("k",))
    def paint_scan(key, k):
        # carry a scalar reduction, not the painted tiles: storing k full
        # (pb, 512, 512) outputs would turn the bench into an HBM test
        def body(acc, i):
            out = painter.paint_batch(dm, zs, rng=jax.random.fold_in(key, i))
            return acc + out.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(k))
        return acc

    # sync by materializing a value: block_until_ready has been observed to
    # return early over the tunneled (axon) backend, which would make this
    # a dispatch-rate benchmark instead of a throughput one
    t0 = time.time()
    assert np.isfinite(float(paint_scan(key, paint_k)))  # compile
    paint_compile_s = time.time() - t0
    rep_ms = []
    for r in range(1, n_reps + 1):
        t0 = time.time()
        float(paint_scan(jax.random.fold_in(key, r), paint_k))
        rep_ms.append((time.time() - t0) * 1e3)
    p50_ms, p95_ms = np.percentile(rep_ms, [50, 95])
    paint_tps = paint_k * pb / (p50_ms / 1e3)
    paint_spread = max(rep_ms) / min(rep_ms)
    log(f"paint: {paint_tps:.1f} tiles/s/chip ({tile}^2, batch {pb}, "
        f"{n_reps} reps x {paint_k}-paint scan dispatches, "
        f"fused={paint_fused}) p50={p50_ms:.1f}ms p95={p95_ms:.1f}ms "
        f"spread={paint_spread:.2f}x compile={paint_compile_s:.1f}s")

    # Device-time paint metric (VERDICT r4 item 7): the wall-clock reps
    # carry tunnel dispatch latency and host stalls (measured 4.37x rep
    # spread in r4). The K-slope cancels every per-dispatch fixed cost:
    # time K=2 and K=paint_k scans, take the MIN over reps of each (a
    # stall can only add time, so min is the stall-free estimate), and
    # divide the difference by the extra paints. The result is per-paint
    # DEVICE time, tunnel-independent up to the clock reading.
    k_lo = 2
    t0 = time.time()
    float(paint_scan(key, k_lo))  # compile the K=2 variant
    lo_compile_s = time.time() - t0
    lo_ms = []
    for r in range(1, n_reps + 1):
        t0 = time.time()
        float(paint_scan(jax.random.fold_in(key, 100 + r), k_lo))
        lo_ms.append((time.time() - t0) * 1e3)
    device_ms_per_paint = (min(rep_ms) - min(lo_ms)) / (paint_k - k_lo)
    paint_device_tps = pb / (device_ms_per_paint / 1e3)
    log(f"paint device time (K-slope {k_lo}->{paint_k}): "
        f"{device_ms_per_paint:.1f} ms/paint -> "
        f"{paint_device_tps:.1f} tiles/s/chip "
        f"(K={k_lo} compile {lo_compile_s:.1f}s, "
        f"min K{k_lo}={min(lo_ms):.1f}ms min K{paint_k}={min(rep_ms):.1f}ms)")

    # FLOPs + MFU so perf regressions are visible, not just samples/s.
    # XLA cost_analysis counts a scan/while BODY once regardless of trip
    # count (measured r3: a 25-step scan reports the same flops as one
    # fwd+bwd), so lower a K=1 scan and take its flops as per-step flops.
    from baryon_painter_tpu.utils.profiling import xla_cost
    try:
        lowered = trainer._train_scan.lower(
            trainer.state, trainer.device_cache.stacks,
            (jax.numpy.zeros((1, batch, 9), jax.numpy.int32),
             jax.numpy.arange(1)),
            jax.random.PRNGKey(0), jax.numpy.ones((1,)),
            jax.numpy.ones((1,)), jax.numpy.ones((1,)))
        flops_per_step, bytes_per_step = xla_cost(lowered.compile())
    except Exception as e:  # lowering is backend-dependent
        log(f"cost_analysis unavailable: {e}")
        flops_per_step = float("nan")
        bytes_per_step = float("nan")
    from baryon_painter_tpu.utils.profiling import (device_peak_bandwidth,
                                                    device_peak_flops)
    peak = device_peak_flops(jax.devices()[0])  # bf16 peak FLOP/s
    peak_bw = device_peak_bandwidth(jax.devices()[0])
    mfu = flops_per_step / (dt / n_steps) / peak
    bw_frac = bytes_per_step / (dt / n_steps) / peak_bw
    log(f"model flops/step={flops_per_step:.3e}  peak={peak:.0e}  "
        f"MFU={100 * mfu:.1f}%  bytes/step={bytes_per_step:.3e}  "
        f"achieved-BW={100 * bw_frac:.0f}% of {peak_bw:.2e} B/s")

    print(json.dumps({
        "metric": "cvae_train_samples_per_sec",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / 14.0, 3),
        "flops_per_step": (None if np.isnan(flops_per_step)
                           else round(flops_per_step / 1e9, 2) * 1e9),
        "mfu": None if np.isnan(mfu) else round(mfu, 4),
        "bytes_per_step": (None if np.isnan(bytes_per_step)
                           else round(bytes_per_step / 1e9, 2) * 1e9),
        "achieved_bw_frac": None if np.isnan(bw_frac) else round(bw_frac, 3),
        "paint_tiles_per_sec": round(paint_tps, 1),
        "paint_fused": paint_fused,
        # explicit compile-vs-steady split (VERDICT r3 item 8) + paint
        # dispatch percentiles (item 3): the paint headline is the p50 of
        # n_reps scan-fused dispatches; spread = max/min across reps
        "compile_s": round(train_compile_s, 1),
        "steady_ms_per_step": round(dt / n_steps * 1000, 2),
        "paint_compile_s": round(paint_compile_s, 1),
        "paint_p50_ms": round(float(p50_ms), 1),
        "paint_p95_ms": round(float(p95_ms), 1),
        "paint_rep_spread": round(paint_spread, 3),
        # tunnel-independent device time per paint dispatch via the
        # K-slope (min-of-reps at K=2 and K=paint_k; fixed per-dispatch
        # costs cancel in the difference)
        "paint_device_ms": round(float(device_ms_per_paint), 2),
        "paint_device_tiles_per_sec": round(float(paint_device_tps), 1),
        # first-dispatch floor decomposition (lower / compile+load /
        # first exec on an AOT object at the step_scan shapes)
        **floor,
    }))


if __name__ == "__main__":
    main()
