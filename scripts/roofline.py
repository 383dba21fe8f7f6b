#!/usr/bin/env python
"""Per-segment roofline breakdown of the fused CVAE train step.

jax.profiler traces hang over the network-attached chip (ROUNDLOG), so this
measures the step the way that does work here: each segment is compiled and
timed standalone as an amortized mean — n dependent calls enqueued, one
value fetch, the separately-measured fetch floor subtracted — and every
compiled segment reports XLA cost_analysis flops + bytes accessed so
achieved bandwidth / MFU can be read off directly. Segments whose total
device time is not well above the fetch floor are flagged
``floor_dominated`` and their MFU/BW are withheld (the subtraction would
amplify floor noise).

Segments:
  gather      device-cache digit gather (raw tiles from HBM stacks)
  prepare     shift-log transforms + NHWC shaping
  forward     full CVAE ELBO forward (train mode)
  fwd+bwd     value_and_grad of the ELBO
  update      adam update from precomputed grads
  step        one full fused train step (gather+fwd+bwd+update)
  scan25      the 25-step scan the trainer actually dispatches

Writes a JSON report (--out) and prints a table to stderr.
"""
import argparse
import faulthandler
import json
import os
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from baryon_painter_tpu.utils.platform import (enable_compilation_cache,
                                               respect_env_platform)

respect_env_platform()

enable_compilation_cache("/tmp/bpt_bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)




def cost_of(compiled):
    from baryon_painter_tpu.utils.profiling import xla_cost
    fl, by = xla_cost(compiled)
    if np.isnan(fl) and np.isnan(by):
        log("  cost_analysis unavailable")
    return fl, by


_FETCH_FLOOR = [0.0]


def _fetch(out):
    """Force completion by fetching one scalar of the output.

    jax.block_until_ready does NOT actually wait on the tunneled-TPU
    backend (measured: 0.02 ms for ops whose HBM traffic alone needs
    >0.7 ms); only a value fetch round-trips. All timings here therefore
    enqueue n dependent iterations and fetch once."""
    import jax
    leaf = jax.tree.leaves(out)[0]
    # slice on-device first: np.asarray on the full leaf would transfer the
    # whole array over the tunnel and charge it to the timed segment
    return np.asarray(leaf.ravel()[:1])


def bench(fn, args, n=20, warmup=3):
    """Amortized wall time of fn(*args): enqueue n calls, one value fetch.

    Device execution is serial in dispatch order, so
    t_op ~= (t_total - fetch_floor) / n. Returns
    (t_op, flops, bytes, floor_dominated): when t_total is not well above
    the fetch floor the subtraction amplifies floor noise, so the result is
    flagged and callers must not derive MFU/BW from it."""
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    flops, bytes_acc = cost_of(compiled)
    # run through the compiled executable everywhere: calling the jitted
    # wrapper would re-trace/re-compile the same program a second time
    for _ in range(warmup):
        _fetch(compiled(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = compiled(*args)
    _fetch(out)
    t_total = time.perf_counter() - t0
    floor_dominated = t_total < 2.0 * _FETCH_FLOOR[0]
    t = max(t_total - _FETCH_FLOOR[0], 1e-9) / n
    return float(t), flops, bytes_acc, floor_dominated


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="cvae", choices=["cvae", "cgan"],
                   help="cvae: full segment suite; cgan: the fused G/D "
                        "adversarial step (gather/prepare/step/scan only; "
                        "other segment names are CVAE-internal)")
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--out", default="docs/roofline_r3.json")
    p.add_argument("--repeats", type=int, default=20)
    p.add_argument("--segments", default=None,
                   help="comma-separated subset to measure: gather,prepare,"
                        "forward,subnets,fwdbwd,update,step,paint,scan "
                        "(default: all; prerequisites compile as needed)")
    args = p.parse_args()
    _KNOWN = {"gather", "prepare", "forward", "subnets", "fwdbwd", "update",
              "step", "paint", "scan"}
    _ALIASES = {"fwd+bwd": "fwdbwd", "scan25": "scan"}  # displayed names
    want = (None if args.segments is None
            else {_ALIASES.get(s.strip(), s.strip())
                  for s in args.segments.split(",") if s.strip()})
    if want is not None and not want <= _KNOWN:
        p.error(f"unknown segment(s) {sorted(want - _KNOWN)}; "
                f"choose from {sorted(_KNOWN)}")

    def sel(*names):
        return want is None or bool(want.intersection(names))

    import jax
    import jax.numpy as jnp

    from baryon_painter_tpu.data.dataset import (BahamasTileDataset,
                                                 load_file_info)
    from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
    from baryon_painter_tpu.models.cvae import CVAE, fiducial_cvae_architecture
    from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
    from baryon_painter_tpu.transforms import RangeCompress

    from baryon_painter_tpu.utils.profiling import (device_peak_bandwidth,
                                                    device_peak_flops)
    dev = jax.devices()[0]
    kind = dev.device_kind
    peak_f = device_peak_flops(dev)
    peak_b = device_peak_bandwidth(dev)
    log(f"device: {dev} kind={kind} peak={peak_f:.3g} FLOP/s "
        f"bw={peak_b:.3g} B/s")

    import tempfile
    root = tempfile.mkdtemp()
    info = make_synthetic_stacks(root, n_stack=2, n_grid=2 * args.tile,
                                 redshifts=(0.0, 1.0), seed=0)
    ds = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        tile_permutations=True,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    log("dataset ready; building trainer (model init compile)...")
    if args.model == "cgan":
        from baryon_painter_tpu.models.cgan import (CGANDiscriminator,
                                                    CGANGenerator)
        from baryon_painter_tpu.train.cgan import (CGANTrainConfig,
                                                   CGANTrainer)
        trainer = CGANTrainer(ds, generator=CGANGenerator(),
                              discriminator=CGANDiscriminator(),
                              config=CGANTrainConfig(seed=0,
                                                     batch_size=args.batch),
                              device_data=True)
        # CVAE-internal segments don't exist on the adversarial trainer
        cgan_segments = {"gather", "prepare", "step", "scan"}
        dropped = set() if want is None else want - cgan_segments
        if dropped:
            log(f"note: segments {sorted(dropped)} are CVAE-internal; "
                f"skipped for --model cgan")
        want = cgan_segments if want is None else want & cgan_segments
    else:
        arch = fiducial_cvae_architecture(tile_size=args.tile, n_res_blocks=4)
        trainer = CVAETrainer(CVAE(arch, dtype=jnp.bfloat16), ds,
                              config=TrainConfig(seed=0), device_data=True)
    log("trainer ready")

    rng = np.random.default_rng(1)
    B = args.batch
    digits = jnp.asarray(trainer.device_cache.digits(
        ds.sample_indices(rng, B)))
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-3)
    one = jnp.float32(1.0)

    results = {}

    # Fetch floor: one trivial op + scalar fetch round trip; subtracted from
    # every amortized segment measurement (see bench/_fetch).
    def noop(a):
        return a + 1.0

    jnoop = jax.jit(noop)
    _fetch(jnoop(jnp.zeros(())))
    floors = []
    for _ in range(10):
        t0 = time.perf_counter()
        _fetch(jnoop(jnp.zeros(())))
        floors.append(time.perf_counter() - t0)
    _FETCH_FLOOR[0] = float(np.median(floors))
    results["fetch_floor"] = {"ms": round(_FETCH_FLOOR[0] * 1e3, 3)}
    log(f"fetch floor (scalar round trip): {_FETCH_FLOOR[0] * 1e3:.2f} ms")

    def _ratio(num, t, peak, digits):
        """None (JSON null) when the numerator OR the peak is unknown."""
        if np.isnan(num) or np.isnan(peak):
            return None
        return round(100 * num / t / peak, digits)

    def run(name, fn, fargs, n=None):
        t, fl, by, floored = bench(fn, fargs, n=n or args.repeats)
        results[name] = {
            "ms": round(t * 1e3, 3),
            "gflops": None if np.isnan(fl) else round(fl / 1e9, 2),
            "mbytes": None if np.isnan(by) else round(by / 1e6, 1),
            # MFU/BW from a floor-dominated time would be noise amplified
            # by the subtraction — withhold them rather than mislead
            "mfu_pct": None if floored else _ratio(fl, t, peak_f, 2),
            "bw_pct": None if floored else _ratio(by, t, peak_b, 1),
        }
        if floored:
            results[name]["floor_dominated"] = True
        r = results[name]
        log(f"{name:>10s}: {r['ms']:8.2f} ms  flops={r['gflops']} G  "
            f"bytes={r['mbytes']} MB  MFU={r['mfu_pct']}%  BW={r['bw_pct']}%"
            + ("  [floor-dominated]" if floored else ""))
        return t

    # --- gather ---------------------------------------------------------- #
    cache = trainer.device_cache
    stacks = cache.stacks
    if sel("gather"):
        run("gather", lambda s, d: cache.gather(d, s), (stacks, digits))

    need_raw = sel("prepare", "forward", "subnets", "fwdbwd", "update",
                   "paint")
    if need_raw:
        raw_input, raw_labels, z = jax.jit(cache.gather)(digits, stacks)
        raw_input, raw_labels, z = (jax.block_until_ready(raw_input),
                                    jax.block_until_ready(raw_labels),
                                    jax.block_until_ready(z))

    # --- prepare (transforms) -------------------------------------------- #
    if sel("prepare"):
        run("prepare", lambda ri, rl, zz: trainer._prepare(ri, rl, zz),
            (raw_input, raw_labels, z))

    if sel("forward", "subnets", "fwdbwd", "update"):
        x, y = jax.jit(trainer._prepare)(raw_input, raw_labels, z)
        x, y = jax.block_until_ready(x), jax.block_until_ready(y)

    # --- forward (ELBO, train mode) --------------------------------------- #
    state = trainer.state

    def fwd(params, bstats, xx, yy, zz, k):
        out, _ = trainer.model.apply(
            {"params": params, "batch_stats": bstats}, xx, yy, zz,
            alpha_var=1.0, beta_KL=1.0, train=True, rngs={"sample": k},
            mutable=["batch_stats"])
        return out["elbo"]

    if sel("forward"):
        run("forward", fwd, (state.params, state.batch_stats, x, y, z, key))

    # --- forward subnets --------------------------------------------------- #
    def q_only(params, bstats, xx, yy, zz):
        def f(m, xx, yy, zz, train=True):
            return m.Q(xx, yy, zz, train=train)
        out, _ = trainer.model.apply(
            {"params": params, "batch_stats": bstats}, xx, yy, zz,
            train=True, method=f, mutable=["batch_stats"])
        return out

    if sel("subnets"):
        run("Q_net", q_only, (state.params, state.batch_stats, x, y, z))

        def prior_only(params, bstats, yy, zz):
            def f(m, yy, zz, train=True):
                return m.prior(yy, zz, train=train)
            out, _ = trainer.model.apply(
                {"params": params, "batch_stats": bstats}, yy, zz,
                train=True, method=f, mutable=["batch_stats"])
            return out

        run("prior_net", prior_only, (state.params, state.batch_stats, y, z))

        zmu, zlv = jax.jit(lambda p, b, xx, yy, zz: q_only(p, b, xx, yy, zz))(
            state.params, state.batch_stats, x, y, z)
        zlat = jax.block_until_ready(
            jax.jit(lambda k, m, v: trainer.model.apply(
                {"params": state.params}, k, m.astype(jnp.float32),
                v.astype(jnp.float32), method=trainer.model.sample_z))(
                    key, zmu, zlv))

        def p_only(params, bstats, zl, yy, zz):
            def f(m, zl, yy, zz, train=True):
                return m.P(zl, yy, zz, train=train)
            out, _ = trainer.model.apply(
                {"params": params, "batch_stats": bstats}, zl, yy, zz,
                train=True, method=f, mutable=["batch_stats"])
            return out

        run("P_net", p_only, (state.params, state.batch_stats, zlat, y, z))

    # --- fwd+bwd ----------------------------------------------------------- #
    def fwd_bwd(params, bstats, xx, yy, zz, k):
        def loss(p):
            return fwd(p, bstats, xx, yy, zz, k)
        l, g = jax.value_and_grad(loss)(params)
        return l, g

    if sel("fwdbwd"):
        run("fwd+bwd", fwd_bwd,
            (state.params, state.batch_stats, x, y, z, key))

    # --- optimizer update -------------------------------------------------- #
    if sel("update"):
        _, grads = jax.jit(fwd_bwd)(state.params, state.batch_stats,
                                    x, y, z, key)
        grads = jax.block_until_ready(grads)

        def upd(g, os_, params):
            d, os2 = trainer.optimizer.update(g, os_, params)
            import optax
            d = jax.tree.map(lambda u: lr * u, d)
            return optax.apply_updates(params, d), os2

        run("update", upd, (grads, state.opt_state, state.params))

    # --- full single step --------------------------------------------------- #
    if sel("step"):
        if args.model == "cgan":
            def full_step(st, s, d, k):
                return trainer._train_step_digits_impl(st, s, d, k, lr)
            run("step", full_step, (trainer.state, stacks, digits, key))
        else:
            def full_step(st, s, d, k):
                return trainer._train_step_digits_impl(st, s, d, k, lr,
                                                       one, one)
            run("step", full_step, (state, stacks, digits, key))

    # --- paint (the lightcone inference path) ------------------------------ #
    # transform -> prior sample -> decode -> inverse transform on a tile
    # batch: the per-shell compute unit of scripts/bench_lightcone.py.
    if sel("paint"):
        from baryon_painter_tpu.painter import CVAEPainter
        painter = CVAEPainter.from_trainer(trainer)
        # gather already returns an on-device float32 batch; a host
        # round-trip here would charge ~25 MB of tunnel transfer to setup
        tiles = raw_input

        def paint(v, t, zz, k):
            return painter._paint_fn(v, t, zz, k, transform=True,
                                     inverse_transform=True)

        run("paint", paint, (painter.variables, tiles, z, key))

    # --- the 25-step scan (what the trainer dispatches) --------------------- #
    if sel("scan"):
        K = 25
        digits_k = jnp.asarray(np.stack(
            [trainer.device_cache.digits(ds.sample_indices(rng, B))
             for _ in range(K)]))
        steps = jnp.arange(K)
        ones_k = jnp.ones((K,), jnp.float32)

        if args.model == "cgan":
            def scan_fn(st, s, dk, sk, k):
                return trainer._train_scan_impl(st, s, (dk, sk), k,
                                                ones_k * 1e-3)
        else:
            def scan_fn(st, s, dk, sk, k):
                return trainer._train_scan_impl(st, s, (dk, sk), k,
                                                ones_k * 1e-3, ones_k, ones_k)

        t_scan, fl, by, floored = bench(
            scan_fn, (state, stacks, digits_k, steps, key),
            n=max(3, args.repeats // 4))
        # XLA cost_analysis counts a scan/while BODY once regardless of trip
        # count (verified: the K-step scan reports the same flops as one
        # fwd+bwd), so `fl`/`by` here already ARE per-step numbers and the
        # per-step MFU/BW divide by t_scan/K, not t_scan.
        t_step = t_scan / K
        results["scan25"] = {
            "ms": round(t_scan * 1e3, 2),
            "ms_per_step": round(t_step * 1e3, 3),
            "gflops_per_step": None if np.isnan(fl) else round(fl / 1e9, 2),
            "mbytes_per_step": None if np.isnan(by) else round(by / 1e6, 1),
            "mfu_pct": None if floored else _ratio(fl, t_step, peak_f, 2),
            "bw_pct": None if floored else _ratio(by, t_step, peak_b, 1),
        }
        if floored:
            results["scan25"]["floor_dominated"] = True
        r = results["scan25"]
        log(f"{'scan25':>10s}: {r['ms_per_step']:8.2f} ms/step  "
            f"flops/step={r['gflops_per_step']} G  bytes/step={r['mbytes_per_step']} MB  "
            f"MFU={r['mfu_pct']}%  BW={r['bw_pct']}%")

    report = {"device_kind": kind, "tile": args.tile, "batch": B,
              "peak_flops": None if np.isnan(peak_f) else peak_f,
              "peak_bw": None if np.isnan(peak_b) else peak_b,
              "conv_rewrites": os.environ.get(
                  "BPT_DISABLE_CONV_REWRITES", "0") != "1",
              "segments": results}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    log(f"wrote {args.out}")
    headline = results.get("scan25") or results.get("step")
    if headline is not None:
        def _num(v):
            return None if (v is None or np.isnan(v)) else v
        print(json.dumps({"metric": "roofline_step_ms",
                          "value": headline.get("ms_per_step",
                                                headline.get("ms")),
                          "unit": "ms/step",
                          "mfu_pct": _num(headline["mfu_pct"]),
                          "bw_pct": _num(headline["bw_pct"])}))
    else:
        print(json.dumps({"metric": "roofline_segments",
                          "value": len(results), "unit": "segments"}))


if __name__ == "__main__":
    main()
