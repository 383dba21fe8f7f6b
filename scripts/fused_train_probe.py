"""TPU compile + timing probe for the fused TRAIN-mode Pallas kernels.

VERDICT r4 weak 1: the strip-restructured train kernels
(ops/pallas_head_stack.py, ops/pallas_conv_bn.py) were verified only in
interpret mode on CPU — this script is the hardware truth. Two modes:

  kernels  — compile (and once-run) each kernel standalone at the
             production 512^2/batch-24 shapes (docs/ab/pnet_breakdown_r4:
             trunk-in s2d conv, the three up-chain transp convs, the
             fused head stack), fwd and fwd+bwd. Localizes Mosaic
             lowering errors / VMEM overflows per kernel.
  step     — compile the FULL fused train step (trainer._train_scan,
             exactly what bench.py times) under a flag config
             (--heads/--conv/--both/--off) and report compile time,
             XLA-reported bytes/step + flops/step, and optionally timed
             steps (--run N).

Results go to stdout as one JSON line per case; stderr carries progress.
Chip etiquette: run only on an otherwise idle chip (the chip is
single-tenant — see trained_models/README.md and docs/roofline.md).
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(rec):
    print(json.dumps(rec), flush=True)


def probe_kernels(run: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from baryon_painter_tpu.ops import conv_rewrites as cr
    from baryon_painter_tpu.ops.pallas_conv_bn import fused_conv_bn_relu
    from baryon_painter_tpu.ops.pallas_head_stack import head_stack

    interpret = jax.default_backend() != "tpu"
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def arr(shape, scale=1.0, dtype=dt):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    cases = [
        # (name, kind, x_shape, w_shape, stride, pad)
        ("trunk_in s2d 512^2 3->16 k5", "s2d", (24, 512, 512, 3),
         (5, 5, 3, 16), 1, 2),
        ("up1 transp 64->128 128->64ch", "transp", (24, 64, 64, 128),
         (4, 4, 128, 64), 2, 1),
        ("up2 transp 128->256 64->32ch", "transp", (24, 128, 128, 64),
         (4, 4, 64, 32), 2, 1),
        ("up3 transp 256->512 32->16ch", "transp", (24, 256, 256, 32),
         (4, 4, 32, 16), 2, 1),
    ]
    for name, kind, xs_shape, ws_shape, s, p in cases:
        x = arr(xs_shape)
        w = arr(ws_shape, 0.1)
        c = ws_shape[-1]
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        if kind == "transp":
            w2 = cr._transp_kernel_3window(w, s, p)
            in_r, out_r = 0, s
        else:
            w2 = cr._s2d_kernel_3window(w, 4, p)
            in_r, out_r = 4, 4

        def fwd_loss(x_, w2_, g_, b_):
            y, mu, var = fused_conv_bn_relu(x_, w2_, g_, b_, in_r, out_r,
                                            1e-5, interpret)
            return jnp.sum(y.astype(jnp.float32) ** 2) + 0.0 * jnp.sum(
                jax.lax.stop_gradient(mu + var))

        for tag, fn in (("fwd", jax.jit(fwd_loss)),
                        ("fwd+bwd", jax.jit(jax.grad(fwd_loss,
                                                     argnums=(0, 1, 2, 3))))):
            rec = {"case": name, "pass": tag, "backend":
                   str(jax.devices()[0].device_kind)}
            t0 = time.time()
            try:
                lowered = fn.lower(x, w2, gamma, beta)
                compiled = lowered.compile()
                rec["compile_s"] = round(time.time() - t0, 2)
                rec["ok"] = True
                if run:
                    out = compiled(x, w2, gamma, beta)
                    leaves = jax.tree.leaves(out)
                    float(jnp.sum(leaves[0].astype(jnp.float32)))  # sync
                    t1 = time.time()
                    reps = 3
                    for _ in range(reps):
                        out = compiled(x, w2, gamma, beta)
                    float(jnp.sum(jax.tree.leaves(out)[0]
                                  .astype(jnp.float32)))
                    rec["run_ms"] = round((time.time() - t1) / reps * 1e3, 2)
            except Exception as e:
                rec["ok"] = False
                rec["compile_s"] = round(time.time() - t0, 2)
                rec["error"] = f"{type(e).__name__}: {str(e)[:500]}"
            log(f"{name} [{tag}]: ok={rec['ok']} "
                f"compile={rec['compile_s']}s "
                + (f"run={rec.get('run_ms')}ms" if "run_ms" in rec else "")
                + ("" if rec["ok"] else f" ERR {rec['error'][:200]}"))
            emit(rec)

    # fused head stack at the production shape; logical weights stay f32
    # like flax params (the deployed path reads child-module params)
    x = arr((24, 512, 512, 16))
    w1 = arr((2, 7, 7, 16, 8), 0.1, jnp.float32)
    w2_ = arr((2, 5, 5, 8, 1), 0.1, jnp.float32)
    w3 = arr((2, 3, 3, 1, 1), 0.1, jnp.float32)
    al = jnp.full((2, 2), 0.25, jnp.float32)

    def hs_loss(x_, a_, b_, c_, al_):
        y = head_stack(x_, a_, b_, c_, al_, (3, 2, 1), interpret)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    for tag, fn in (("fwd", jax.jit(hs_loss)),
                    ("fwd+bwd", jax.jit(jax.grad(hs_loss,
                                                 argnums=(0, 1, 2, 3, 4))))):
        rec = {"case": "head_stack 512^2 16->8->1->1 x2", "pass": tag}
        t0 = time.time()
        try:
            compiled = fn.lower(x, w1, w2_, w3, al).compile()
            rec["compile_s"] = round(time.time() - t0, 2)
            rec["ok"] = True
            if run:
                out = compiled(x, w1, w2_, w3, al)
                float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
                t1 = time.time()
                reps = 3
                for _ in range(reps):
                    out = compiled(x, w1, w2_, w3, al)
                float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
                rec["run_ms"] = round((time.time() - t1) / reps * 1e3, 2)
        except Exception as e:
            rec["ok"] = False
            rec["compile_s"] = round(time.time() - t0, 2)
            rec["error"] = f"{type(e).__name__}: {str(e)[:500]}"
        log(f"head_stack [{tag}]: ok={rec['ok']} "
            f"compile={rec['compile_s']}s "
            + (f"run={rec.get('run_ms')}ms" if "run_ms" in rec else "")
            + ("" if rec["ok"] else f" ERR {rec['error'][:200]}"))
        emit(rec)


def probe_step(run_steps: int):
    import tempfile

    import jax
    import numpy as np

    from baryon_painter_tpu.data.dataset import (BahamasTileDataset,
                                                 load_file_info)
    from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
    from baryon_painter_tpu.models.cvae import (CVAE,
                                                fiducial_cvae_architecture)
    from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
    from baryon_painter_tpu.transforms import RangeCompress

    tile, batch = 512, 24
    root = tempfile.mkdtemp()
    info = make_synthetic_stacks(root, n_stack=2, n_grid=2 * tile,
                                 redshifts=(0.0, 1.0), seed=0)
    ds = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        tile_permutations=True,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    arch = fiducial_cvae_architecture(tile_size=tile, n_res_blocks=4)
    trainer = CVAETrainer(CVAE(arch, dtype=jax.numpy.bfloat16), ds,
                          config=TrainConfig(seed=0), device_data=True)
    flags = {k: os.environ.get(k, "0")
             for k in ("BPT_FUSED_HEADS", "BPT_FUSED_TRAIN_CONV")}
    rec = {"case": "train_step 512^2 b24 bf16", "flags": flags}
    rng = np.random.default_rng(1)
    idx = np.stack([ds.sample_indices(rng, batch)])
    t0 = time.time()
    try:
        m = trainer.step_scan(idx, lr=1e-3)
        elbo = float(m["elbo"][-1])
        rec["compile_s"] = round(time.time() - t0, 2)
        rec["ok"] = bool(np.isfinite(elbo))
        rec["elbo"] = elbo
        try:
            from baryon_painter_tpu.utils.profiling import xla_cost
            lowered = trainer._train_scan.lower(
                trainer.state, trainer.device_cache.stacks,
                (jax.numpy.zeros((1, batch, 9), jax.numpy.int32),
                 jax.numpy.arange(1)),
                jax.random.PRNGKey(0), jax.numpy.ones((1,)),
                jax.numpy.ones((1,)), jax.numpy.ones((1,)))
            f, b = xla_cost(lowered.compile())
            rec["flops_per_step"] = f
            rec["bytes_per_step"] = b
        except Exception as e:
            rec["cost_error"] = str(e)[:200]
        if run_steps:
            k = run_steps
            idk = np.stack([ds.sample_indices(rng, batch)
                            for _ in range(k)])
            m = trainer.step_scan(idk, lr=1e-3)  # warm
            float(m["elbo"][-1])
            t1 = time.time()
            m = trainer.step_scan(idk, lr=1e-3)
            float(m["elbo"][-1])
            dt_ = time.time() - t1
            rec["steady_ms_per_step"] = round(dt_ / k * 1e3, 2)
            rec["samples_per_sec"] = round(k * batch / dt_, 2)
    except Exception as e:
        rec["ok"] = False
        rec["compile_s"] = round(time.time() - t0, 2)
        rec["error"] = f"{type(e).__name__}: {str(e)[:800]}"
    log(f"step {flags}: ok={rec['ok']} compile={rec['compile_s']}s "
        + (f"steady={rec.get('steady_ms_per_step')}ms/step "
           f"{rec.get('samples_per_sec')} samples/s"
           if "steady_ms_per_step" in rec else "")
        + ("" if rec["ok"] else f" ERR {rec.get('error', '')[:300]}"))
    emit(rec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["kernels", "step"])
    ap.add_argument("--run", type=int, default=0,
                    help="kernels: 1 = execute each; step: N timed steps")
    ap.add_argument("--heads", action="store_true")
    ap.add_argument("--conv", action="store_true")
    args = ap.parse_args()
    if args.heads:
        os.environ["BPT_FUSED_HEADS"] = "1"
    if args.conv:
        os.environ["BPT_FUSED_TRAIN_CONV"] = "1"
    if args.mode == "kernels":
        probe_kernels(bool(args.run))
    else:
        probe_step(args.run)


if __name__ == "__main__":
    main()
