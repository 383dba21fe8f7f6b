#!/usr/bin/env python
"""Physics-fidelity check: train the CVAE, gate on P(k) fractional error.

Trains the fiducial architecture on synthetic stacks whose pressure field is
physically coupled to the DM field (P ~ rho^1.5), then paints validation
tiles with the prior and reports the auto- and cross-P(k) fractional errors
(the reference's validation metric; the north-star gate is 5%).

Prints one JSON line with the P(k) errors before/after training.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


# Per-(dataset, z, seed, n) cache of everything eval-invariant: the device
# DM batch, the truth auto/cross spectra (binned means), and the truth
# summary scalars. The gate evaluates the SAME validation tiles at every
# eval (sampling is deterministic in seed), so without this every eval
# re-paid ~100 MB of host<->device traffic and the truth FFTs per
# (dtype, z) leg — ~4-5 min per gate eval over a tunneled chip, several
# times per fine-tune leg.
_PK_TRUTH_CACHE = {}


def pk_errors(painter, ds, n_sample=48, seed=0, z=None, matmul_precision=None):
    """P(k) fractional errors of painted-vs-truth tiles.

    ``matmul_precision``: when set (e.g. "highest"), paint under
    ``jax.default_matmul_precision`` — on TPU the default lowers even
    float32 convs to single-pass bfloat16 MXU products, so a "f32" gate
    leg without this is bf16 arithmetic in disguise (measured: a
    bf16-selected checkpoint scored 0.046 on the default-precision
    "f32" leg but 0.10 in genuine f32). The context is part of JAX's
    trace context, so jitted paint graphs specialize correctly per leg.

    Everything stays on device (paint -> clip -> FFT spectra); only the
    binned spectra cross to the host.
    """
    import contextlib

    import jax
    import jax.numpy as jnp
    from baryon_painter_tpu.power_spectrum import pseudo_pofk_2d

    key = (id(ds), z, seed, n_sample)
    cached = _PK_TRUTH_CACHE.get(key)
    if cached is None:
        rng = np.random.default_rng(seed)
        idx = ds.sample_indices(rng, n_sample, z=z)
        batch = ds.get_raw_batch(idx)
        truth = batch["labels"][0]
        dm_dev = jax.device_put(jnp.asarray(batch["input"], jnp.float32))
        truth_dev = jnp.asarray(truth, jnp.float32)
        pk_t, _, _, nm = pseudo_pofk_2d(truth_dev, L=ds.tile_L, n_k_bin=12)
        pk_ct, *_ = pseudo_pofk_2d(truth_dev, dm_dev, L=ds.tile_L,
                                   n_k_bin=12)
        occ = np.asarray(nm) > 0
        cached = {
            # dm stays HOST-side: a device-resident cache (11 z x 50 MB)
            # tipped the 512^2 pk-loss fine-tune over HBM
            # (RESOURCE_EXHAUSTED at the first train step); the per-eval
            # re-upload is the price of fitting
            "dm": np.asarray(batch["input"], np.float32),
            "zs": jnp.asarray(batch["z"], jnp.float32),
            "occ": occ,
            "pk_t": np.asarray(pk_t).mean(0)[occ],
            "pk_ct": np.asarray(pk_ct).mean(0)[occ],
            "truth_max": float(truth.max()),
            "truth_mean": float(truth.mean()),
            "truth_std": float(truth.std()),
        }
        _PK_TRUTH_CACHE[key] = cached
    dm_dev = jnp.asarray(cached["dm"])
    ctx = (jax.default_matmul_precision(matmul_precision)
           if matmul_precision else contextlib.nullcontext())
    with ctx:
        painted = painter.paint_batch(dm_dev, cached["zs"],
                                      rng=jax.random.PRNGKey(seed))
    painted = painted.astype(jnp.float32)
    occ = cached["occ"]
    pk_p, *_ = pseudo_pofk_2d(painted, L=ds.tile_L, n_k_bin=12)
    auto = np.abs(np.asarray(pk_p).mean(0)[occ] / cached["pk_t"] - 1)
    # tail-clipped variant: cap painted pixels at the truth's max (the
    # reference's outlier-regularisation rationale, process_SLICS.py:212-216)
    painted_cl = jnp.clip(painted, None, cached["truth_max"])
    pk_c, *_ = pseudo_pofk_2d(painted_cl, L=ds.tile_L, n_k_bin=12)
    auto_cl = np.abs(np.asarray(pk_c).mean(0)[occ] / cached["pk_t"] - 1)
    pk_cp, *_ = pseudo_pofk_2d(painted, dm_dev, L=ds.tile_L,
                               n_k_bin=12)
    cross = np.abs(np.asarray(pk_cp).mean(0)[occ] / cached["pk_ct"] - 1)
    diag = {"mean_ratio": float(jnp.mean(painted)) / cached["truth_mean"],
            "std_ratio": float(jnp.std(painted)) / cached["truth_std"],
            "auto_clipped": float(np.median(auto_cl))}
    return float(np.median(auto)), float(np.median(cross)), diag


def allocate_batch_shares(batch, shares, zs):
    """Largest-remainder allocation of `batch` samples over per-z `shares`.

    Exact for the static CLI contract (batch % sum(shares) == 0 gives
    per-share integer quotas), and well-defined for the dynamic
    '--z-boost auto' case where the share total need not divide the batch.
    Every z gets at least one sample — the per-z masked batch-mean P(k)
    loss (TrainConfig.pk_loss_per_z) needs every redshift represented in
    every step's batch.
    """
    if batch < len(zs):
        raise ValueError(f"batch {batch} < {len(zs)} redshifts: the per-z "
                         f"spectral loss needs every z in every batch")
    total = sum(shares[z] for z in zs)
    raw = {z: batch * shares[z] / total for z in zs}
    counts = {z: int(raw[z]) for z in zs}
    rem = batch - sum(counts.values())
    for z in sorted(zs, key=lambda w: raw[w] - counts[w], reverse=True)[:rem]:
        counts[z] += 1
    for z in zs:
        if counts[z] == 0:
            donor = max(zs, key=lambda w: counts[w])
            counts[donor] -= 1
            counts[z] = 1
    return counts


def validate_fine_tune_args(args, zs):
    """Parse-time validation of the spectral fine-tune flag combination.

    Returns (shares, auto_boost). Depends only on argv-derived values so it
    runs before any dataset/model/JAX work — a bad combination (e.g.
    '--z-boost auto' without --eval-every, or a batch size the z shares
    don't divide) must not cost a checkpoint restore and a multi-minute
    512^2 paint-graph compile first.
    """
    stratify = args.pk_loss_weight > 0
    # --z-boost "0:2,0.5:1" gives redshift 0 two batch shares per share of
    # every other z: more tiles -> a less noisy per-z P(k) estimate and a
    # stronger gradient for the redshift that sits on the gate floor, while
    # gate selection still scores ALL redshifts (so the boosted fine-tune
    # cannot silently regress the others).
    shares = {z: 1 for z in zs}
    auto_boost = 0
    if args.z_boost:
        if args.z_boost.split(":")[0] == "auto":
            # dynamic boost: re-targeted to the binding redshift(s) at every
            # eval (maybe_eval in main) — the binding z migrates as the
            # fine-tune progresses (observed: z=0.5 -> z=1 within one leg),
            # so a static boost goes stale mid-run
            try:
                auto_boost = (int(args.z_boost.split(":", 1)[1])
                              if ":" in args.z_boost else 2)
            except ValueError:
                raise SystemExit(
                    f"--z-boost {args.z_boost!r}: 'auto' takes a single "
                    f"integer share count ('auto' or 'auto:K'); it cannot "
                    f"be mixed with static z:share entries")
            if auto_boost < 2:
                raise SystemExit("--z-boost auto:K needs K >= 2 "
                                 "(K=1 is a no-op)")
            if not args.eval_every:
                raise SystemExit("--z-boost auto re-targets at each eval; "
                                 "it needs --eval-every")
        else:
            for part in args.z_boost.split(","):
                zstr, w = part.split(":")
                zval = float(zstr)
                if zval not in shares:
                    raise SystemExit(f"--z-boost: z={zstr} not in "
                                     f"--redshifts")
                shares[zval] = int(w)
    n_shares = sum(shares.values())
    if stratify and not auto_boost and args.batch % n_shares:
        raise SystemExit(f"--batch {args.batch} must be divisible by the "
                         f"total z shares ({n_shares}) for the per-z "
                         f"spectral loss")
    if stratify and args.batch < len(zs):
        raise SystemExit(f"--batch {args.batch} < {len(zs)} redshifts: the "
                         f"per-z spectral loss needs every z in every batch")
    if args.z_boost and not stratify:
        raise SystemExit("--z-boost only takes effect with the stratified "
                         "spectral fine-tune (--pk-loss-weight > 0); "
                         "without it batches are sampled uniformly and the "
                         "flag would be silently ignored")
    return shares, auto_boost


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="cvae", choices=["cvae", "cgan"])
    p.add_argument("--tile", type=int, default=256)
    p.add_argument("--redshifts", default="0,0.5,1",
                   help="comma-separated training/eval redshifts (the "
                        "reference fiducial uses 11: "
                        "0,0.125,0.25,0.375,0.5,0.75,1,1.25,1.5,1.75,2)")
    p.add_argument("--n-stack", type=int, default=4,
                   help="synthetic stacks per (field, z, depth); the first "
                        "is held out for validation")
    p.add_argument("--n-samples", type=int, default=30000)
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--scan", type=int, default=25)
    p.add_argument("--lr", type=float, default=None,
                   help="base learning rate (default: 1e-3 for the CVAE, "
                        "5e-5 for the CGAN — the reference values)")
    p.add_argument("--beta-kl", type=float, default=1.0,
                   help="KL weight; >1 forces the posterior toward the prior "
                        "(useful when the conditional is nearly deterministic)")
    p.add_argument("--alpha-var", type=float, default=1.0)
    p.add_argument("--pressure-noise", type=float, default=0.1)
    p.add_argument("--physical", action="store_true",
                   help="use the BAHAMAS-like synthetic statistics "
                        "(powerlaw-lognormal density, growth-like z "
                        "evolution, smoothed pressure with correlated "
                        "scatter) instead of the Gaussian-bump default — a "
                        "harder, more physical dm->pressure mapping for the "
                        "5%% gate")
    p.add_argument("--upsample", default="transpose",
                   choices=["transpose", "resize"])
    p.add_argument("--dm-transform", default="shift-log:4",
                   help="range-compression spec 'mode:k' (or 'mode:k1,k2' "
                        "for two-parameter modes) for the DM field; modes "
                        "as in transforms.RangeCompress. Default is the "
                        "fiducial shift-log k=4")
    p.add_argument("--pressure-transform", default="shift-log:4",
                   help="like --dm-transform, for the pressure field. "
                        "'log-tanh:K' bounds the transformed target to "
                        "(-1,1) — stronger tail compression for the "
                        "heavy-tailed --physical statistics (the "
                        "physical-512 recipe). On --resume/--eval-only "
                        "the checkpoint meta's transforms override these "
                        "flags (the gate must paint through the "
                        "transforms the model was trained with)")
    p.add_argument("--pk-loss-weight", type=float, default=0.0,
                   help="weight of the spectral auxiliary loss "
                        "(trainer.TrainConfig.pk_loss_weight); the ELBO is "
                        "O(1e5)/sample so useful values are ~1e4-1e6")
    p.add_argument("--train-dtype", default="bf16",
                   choices=["bf16", "f32"],
                   help="conv compute dtype of the training model (bf16 is "
                        "the TPU provenance; f32 is ~100x faster on CPU, "
                        "where XLA lowers bf16 convs off the oneDNN path — "
                        "use it for CPU fine-tunes and re-check both paint "
                        "dtypes with --eval-only afterwards)")
    p.add_argument("--gate-dtype", default="both",
                   choices=["model", "f32", "both"],
                   help="conv compute dtype(s) the P(k) gate paints with: "
                        "'model' = the training model's dtype (bfloat16 — "
                        "the historical behavior), 'f32' = portable float32, "
                        "'both' (default) = score and select on the worst of "
                        "the two. A fine-tune selected on bf16 alone can "
                        "overfit the gate to one platform's rounding "
                        "(observed: a bf16-TPU-selected checkpoint at 0.026 "
                        "scored 0.44 under CPU bf16 emulation)")
    p.add_argument("--adv-weight", type=float, default=1.0,
                   help="CGAN only: weight of the adversarial BCE in the G "
                        "loss. 0 freezes the discriminator and adversarial "
                        "gradient entirely — spectral/perceptual calibration "
                        "of a trained generator (a live D keeps injecting "
                        "the high-k power the P(k) objective removes)")
    p.add_argument("--perc-weight", type=float, default=2.5,
                   help="CGAN only: lambda_perceptual, the L1 pixel-loss "
                        "weight in the G loss (reference 2.5, "
                        "trained_models/README.md:130-139). In calibration "
                        "mode (--adv-weight 0) the L1 term pulls the "
                        "generator toward a blurred mean prediction whose "
                        "auto-P(k) loses high-k power faster than a weak "
                        "spectral term can restore it — lower this (or "
                        "raise --pk-loss-weight to the CVAE's ~2e4 scale) "
                        "when fine-tuning without a live discriminator")
    p.add_argument("--z-boost", default=None,
                   help="comma-separated z:shares batch weighting for the "
                        "spectral fine-tune, e.g. '0:2' samples redshift 0 "
                        "at twice the rate of every other z (gate selection "
                        "still scores all redshifts). Batch size must divide "
                        "by the total share count. 'auto' (or 'auto:K', "
                        "default K=2) re-targets the boost at every eval to "
                        "whichever redshifts currently bind the gate (within "
                        "80%% of the worst per-z value) — the binding z "
                        "migrates as a fine-tune progresses, so a static "
                        "boost goes stale mid-run; batches are allocated by "
                        "largest remainder (any batch >= n_z works).")
    p.add_argument("--feature-matching", action="store_true",
                   help="CGAN: generator adversarial term = batch-mean D "
                        "feature matching (Salimans 2016) instead of BCE; "
                        "D still trains with BCE (the third adv-ON recipe)")
    p.add_argument("--reinit-d", type=int, default=None, metavar="SEED",
                   help="CGAN --resume only: re-initialize the "
                        "discriminator (params, batch stats, optimizer "
                        "moments) from this seed while keeping the restored "
                        "generator - the 'fresh D head' adv-ON recipe "
                        "(trained_models/CGAN/fiducial-adv/README.md)")
    p.add_argument("--freeze-bn", action="store_true",
                   help="CVAE fine-tunes: keep BatchNorm running stats "
                        "fixed at their restored values (TrainConfig."
                        "freeze_bn_stats). The gate paints through "
                        "eval-mode BN, so momentum-0.9 running-stat "
                        "updates move the gate even at lr->0; freezing "
                        "makes a resumed gate-floor checkpoint actually "
                        "refinable (the CGAN calibration mode does this "
                        "implicitly)")
    p.add_argument("--clip-grad", type=float, default=0.0,
                   help="global-norm gradient clip (0 = off). The spectral "
                        "loss on the heavy-tailed --physical fixtures "
                        "occasionally spikes; unclipped spikes bounce a "
                        "near-converged fine-tune off its gate floor "
                        "(TrainConfig.clip_grad_norm)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workdir", default="/tmp/bpt_fidelity")
    p.add_argument("--resume", action="store_true",
                   help="restore the checkpoint from a previous run")
    p.add_argument("--eval-every", type=int, default=0,
                   help="evaluate the per-z P(k) gate every N training steps "
                        "and keep the best-scoring parameters (the spectral "
                        "objective oscillates near its minimum, so the final "
                        "step is a lottery; select on the gate metric "
                        "max_z max(auto, cross) instead)")
    p.add_argument("--select-within-run", action="store_true",
                   help="with --resume --eval-every: do NOT seed the "
                        "best-checkpoint selection with the restored "
                        "state's own gate score. Use when the point of the "
                        "leg is to demonstrate a property of THIS run's "
                        "training (e.g. an adversarially-ON fine-tune "
                        "whose best eval must come from adv-ON steps) — "
                        "the default floor would silently hand the 'best' "
                        "back to the restored pre-leg parameters")
    p.add_argument("--eval-tiles", type=int, default=48,
                   help="validation tiles per redshift for each gate eval. "
                        "Measured eval noise at 48 tiles is sigma~0.01 on "
                        "the per-z metric (docs/ab/gate_variance_phys512_"
                        "lt_r5.json); raise for final reports when the "
                        "model sits near the gate")
    p.add_argument("--eval-only", action="store_true",
                   help="restore the checkpoint and report P(k) errors "
                        "without training (implies --resume)")
    p.add_argument("--checkpoint", default=None,
                   help="explicit checkpoint base path to restore "
                        "(default: <workdir>/fidelity_model_<model>)")
    p.add_argument("--save-figures", action="store_true",
                   help="save sample/P(k)/histogram figures from the trained "
                        "model into the workdir")
    args = p.parse_args()
    if args.lr is None:
        # per-model defaults (ADVICE r2: the CVAE's 1e-3 destabilizes the
        # CGAN, whose reference lr is 5e-5, trained_models/README.md:130-139)
        args.lr = 1e-3 if args.model == "cvae" else 5e-5
    redshifts = tuple(float(s) for s in args.redshifts.split(","))
    # Fail fast on flag-combination errors: these used to be checked only
    # after dataset synthesis + checkpoint restore + the untrained paint-graph
    # compile (~10+ min of TPU time on a 512^2 run) had already been paid.
    shares, auto_boost = validate_fine_tune_args(args, list(redshifts))

    import jax

    from baryon_painter_tpu.utils.platform import (
        enable_compilation_cache, respect_env_platform)
    respect_env_platform()
    enable_compilation_cache()
    import jax.numpy as jnp

    from baryon_painter_tpu.data.dataset import (BahamasTileDataset,
                                                 load_file_info)
    from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
    from baryon_painter_tpu.models.cvae import (CVAE,
                                                fiducial_cvae_architecture)
    from baryon_painter_tpu.painter import CVAEPainter
    from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
    from baryon_painter_tpu.transforms import RangeCompress

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    physical_kw = (dict(spectrum="powerlaw", sigma0=1.2, pressure_smooth=2.0,
                        pressure_noise_corr=2.0) if args.physical else {})
    info = make_synthetic_stacks(args.workdir, n_stack=args.n_stack,
                                 n_grid=2 * args.tile,
                                 redshifts=redshifts, seed=args.seed,
                                 name="fid", pressure_noise=args.pressure_noise,
                                 **physical_kw)
    def parse_transform(spec):
        mode, _, kstr = spec.partition(":")
        if not kstr:
            raise SystemExit(f"transform spec {spec!r}: expected 'mode:k'")
        k = (tuple(float(x) for x in kstr.split(","))
             if "," in kstr else float(kstr))
        return RangeCompress(mode, k, eps=1e-4)

    transforms = {"dm": parse_transform(args.dm_transform),
                  "pressure": parse_transform(args.pressure_transform)}
    # On restore, the checkpoint meta's transform specs are the source of
    # truth (like the architecture below): the gate must paint through the
    # transforms the model was trained with, not whatever the CLI says.
    _ckpt_base_early = (args.checkpoint if args.checkpoint is not None
                        else os.path.join(args.workdir,
                                          f"fidelity_model_{args.model}"))
    if (args.resume or args.eval_only) and os.path.exists(
            _ckpt_base_early + "_meta.json"):
        from baryon_painter_tpu.transforms import transform_from_dict
        with open(_ckpt_base_early + "_meta.json") as f:
            _meta_tf = json.load(f).get("transforms")
        if _meta_tf:
            restored = {f: transform_from_dict(d) for f, d in _meta_tf.items()}
            if restored != transforms:
                print(f"note: using the checkpoint's transforms "
                      f"{ {f: (t.mode, t.k) for f, t in restored.items()} } "
                      f"over the CLI flags", file=sys.stderr, flush=True)
            transforms = restored
    train_ds = BahamasTileDataset(files=load_file_info(info),
                                  root_path=args.workdir, n_tile=2,
                                  n_stack=args.n_stack - 1, stack_offset=1,
                                  tile_permutations=True,
                                  transforms=transforms)
    val_ds = BahamasTileDataset(data=train_ds.data, n_stack=1,
                                stack_offset=0, n_tile=2,
                                tile_permutations=True,
                                transforms=transforms)
    # When restoring, the checkpoint's own meta is the architecture source
    # of truth — a CLI flag mismatch (e.g. forgetting --upsample resize for
    # a resize-decoder checkpoint) must not rebuild a different model.
    ckpt_base = (args.checkpoint if args.checkpoint is not None
                 else os.path.join(args.workdir,
                                   f"fidelity_model_{args.model}"))
    meta_arch = None
    if (args.resume or args.eval_only) and os.path.exists(
            ckpt_base + "_meta.json"):
        with open(ckpt_base + "_meta.json") as f:
            meta_arch = json.load(f).get("model_architecture")
        # the CVAE arch dict bakes the decoder choice into its DSL layers;
        # only the CGAN meta carries an explicit upsample key to honor.
        # Pre-'upsample'-meta CGAN checkpoints: sniff the state dict (a
        # transposed-conv generator carries ConvTranspose2d kernels).
        if args.model == "cgan" and meta_arch is not None:
            if "upsample" in meta_arch:
                sniffed = meta_arch["upsample"]
            elif os.path.exists(ckpt_base + "_state.msgpack"):
                import flax.serialization

                def _has_transpose(d):
                    return any("ConvTranspose" in k
                               or (isinstance(v, dict) and _has_transpose(v))
                               for k, v in d.items())

                with open(ckpt_base + "_state.msgpack", "rb") as f:
                    raw = flax.serialization.msgpack_restore(f.read())
                sniffed = ("transpose"
                           if _has_transpose(raw.get("g_params", raw))
                           else "resize")
            else:
                sniffed = args.upsample
            if sniffed != args.upsample:
                print(f"note: checkpoint generator is upsample={sniffed!r}; "
                      f"overriding --upsample", file=sys.stderr, flush=True)
                args.upsample = sniffed

    if args.model == "cvae":
        arch = (meta_arch if meta_arch is not None else
                fiducial_cvae_architecture(tile_size=args.tile,
                                           n_res_blocks=4,
                                           upsample=args.upsample))
        train_dtype = jnp.bfloat16 if args.train_dtype == "bf16" else None
        trainer = CVAETrainer(
            CVAE(arch, dtype=train_dtype), train_ds,
            config=TrainConfig(seed=args.seed,
                               pk_loss_weight=args.pk_loss_weight,
                               pk_loss_per_z=args.pk_loss_weight > 0,
                               freeze_bn_stats=args.freeze_bn,
                               clip_grad_norm=args.clip_grad),
            device_data=True)
        make_painter = lambda dtype="keep": CVAEPainter.from_trainer(
            trainer, dtype=dtype)
    else:
        from baryon_painter_tpu.models.cgan import (CGANDiscriminator,
                                                    CGANGenerator)
        from baryon_painter_tpu.painter import CGANPainter
        from baryon_painter_tpu.train.cgan import (CGANTrainConfig,
                                                   CGANTrainer)
        gen_kw = dict(upsample=args.upsample)
        if meta_arch is not None:
            gen_kw.update(
                in_channels=meta_arch.get("in_channels", 2),
                n_res_blocks=meta_arch.get("n_res_blocks", 9))
        trainer = CGANTrainer(train_ds, test_data=val_ds,
                              generator=CGANGenerator(**gen_kw),
                              discriminator=CGANDiscriminator(),
                              config=CGANTrainConfig(
                                  seed=args.seed, batch_size=args.batch,
                                  pk_loss_weight=args.pk_loss_weight,
                                  pk_loss_per_z=args.pk_loss_weight > 0,
                                  adversarial_weight=args.adv_weight,
                                  lambda_perceptual=args.perc_weight,
                                  feature_matching=args.feature_matching,
                                  freeze_bn_stats=args.freeze_bn,
                                  clip_grad_norm=args.clip_grad),
                              device_data=True)
        make_painter = lambda dtype="keep": CGANPainter.from_trainer(
            trainer, dtype=dtype)
    if ((args.resume or args.eval_only)
            and os.path.exists(ckpt_base + "_state.msgpack")):
        trainer.restore(ckpt_base)
        print("restored checkpoint", file=sys.stderr, flush=True)
        if args.reinit_d is not None:
            if args.model != "cgan" or args.eval_only:
                raise SystemExit("--reinit-d needs --model cgan --resume")
            trainer.reinit_discriminator(args.reinit_d)
            print(f"discriminator re-initialized (seed {args.reinit_d})",
                  file=sys.stderr, flush=True)
    elif args.eval_only:
        raise SystemExit(f"--eval-only: no checkpoint at {ckpt_base}")
    elif (args.checkpoint is not None
          and os.path.exists(ckpt_base + "_state.msgpack")):
        # ADVICE r2: a fresh run must not silently clobber a named existing
        # checkpoint — restoring is opt-in via --resume/--eval-only
        raise SystemExit(
            f"checkpoint {ckpt_base} exists; pass --resume to continue from "
            f"it or --eval-only to score it (refusing to overwrite with a "
            f"fresh-seed run)")
    # the gate paints under these (conv compute dtype, matmul precision)
    # legs; "keep" = the training model's dtype (bf16), None = float32
    # input dtype. The f32 leg forces matmul precision "highest" — on TPU
    # the default lowers f32 convs to single-pass bf16 MXU products, so
    # without it the "portable f32" leg is bf16 arithmetic in disguise.
    # f32 leads so it is the headline; pass/selection use the worst leg.
    gate_dtypes = {"model": [("model", "keep", None)],
                   "f32": [("f32", None, "highest")],
                   "both": [("f32", None, "highest"),
                            ("model", "keep", None)]}[args.gate_dtype]
    train_dtype = (trainer.model.dtype if args.model == "cvae"
                   else trainer.generator.dtype)
    if len(gate_dtypes) > 1 and train_dtype in (None, jnp.float32):
        # the model already computes in f32 input dtype — but the two legs
        # still differ in arithmetic (default vs highest matmul precision),
        # so keep both only when they would actually paint differently
        # (i.e. on backends where precision changes the lowering: TPU).
        if jax.devices()[0].platform == "cpu":
            gate_dtypes = [("f32", None, "highest")]
    painter = make_painter(dtype=gate_dtypes[0][1])

    # warm the paint graph + baseline errors with untrained weights
    auto0, cross0, diag0 = pk_errors(painter, val_ds, seed=args.seed,
                                     n_sample=args.eval_tiles,
                                     matmul_precision=gate_dtypes[0][2])
    print(f"untrained: auto={auto0:.3f} cross={cross0:.3f} {diag0}",
          file=sys.stderr, flush=True)

    rng = np.random.default_rng(args.seed + 1)
    n_steps = args.n_samples // args.batch
    t0 = time.time()
    done = 0
    # With the spectral aux loss on, balance every batch across redshifts
    # (equal counts per z) so the per-z masked batch-mean P(k) the loss
    # matches (TrainConfig.pk_loss_per_z) sees every z each step — a pooled
    # mixed-z loss lets the model overshoot one z and undershoot another with
    # a perfect z-averaged spectrum, and single-z steps thrash the optimizer
    # with conflicting per-step gradients (both observed).
    zs = list(train_ds.redshifts)
    stratify = args.pk_loss_weight > 0
    # shares/auto_boost were validated and computed at parse time
    # (validate_fine_tune_args) so a bad flag combination fails in
    # milliseconds, not after minutes of restore + paint-graph compile.

    def step_indices(j):
        if not stratify:
            return train_ds.sample_indices(rng, args.batch)
        counts = allocate_batch_shares(args.batch, shares, zs)
        return np.concatenate([train_ds.sample_indices(rng, counts[z], z=z)
                               for z in zs])

    if args.eval_only:
        n_steps = 0

    # reference-format training_stats.txt next to the checkpoint so trained
    # artifacts ship with their loss history (trained_models/CVAE/fiducial-512/
    # training_stats.txt layout; appended across --resume phases)
    stats = None
    if not args.eval_only:
        from baryon_painter_tpu.train.stats import TrainingStats
        # single source of truth for the CGAN term order: the trainer's own
        # label list (minus its trailing lr/batch_size bookkeeping columns),
        # so a metrics change cannot desync the shipped stats headers
        cgan_terms = (None if args.model == "cvae"
                      else list(trainer.stats_labels()[:-2]))
        labels = (list(trainer.model.get_stats_labels())
                  if args.model == "cvae" else list(cgan_terms))
        # separate file per phase: the pk fine-tune adds a loss term, and a
        # resumed TrainingStats requires an identical header
        suffix = "_pkft" if args.pk_loss_weight > 0 else ""
        if args.pk_loss_weight > 0:
            labels.append("pk_loss")
        stats_file = os.path.join(args.workdir,
                                  f"training_stats_{args.model}{suffix}.txt")
        stats = TrainingStats(labels, dump_to_file_frequency=200,
                              stats_filename=stats_file,
                              resume=args.resume and os.path.exists(stats_file))
    sample_base = (stats.n_processed_samples[-1]
                   if stats is not None and stats.n_processed_samples else 0)

    def record(m, k, done):
        if stats is None:
            return
        arrs = {key: np.asarray(v) for key, v in m.items()}
        for i in range(k):
            if args.model == "cvae":
                vals = [float(arrs["elbo"][i]), -float(arrs["kl"][i])]
                vals += list(arrs["log_likelihood"][i].reshape(-1))
                if "log_likelihood_fixed_var" in arrs:
                    vals += list(
                        arrs["log_likelihood_fixed_var"][i].reshape(-1))
                    vals += list(
                        arrs["log_likelihood_free_var"][i].reshape(-1))
            else:
                vals = [float(arrs[key][i]) for key in cgan_terms]
            if args.pk_loss_weight > 0:
                vals.append(float(arrs["pk_loss"][i]))
            stats.push_loss(sample_base + (done + i + 1) * args.batch, *vals)

    def gate_metric(return_per_z=False):
        """max over gate dtypes and z of max(auto, cross) — the pass_5pct
        criterion. Scoring the worst dtype keeps the selected parameters in
        a rounding-robust minimum instead of one platform's arithmetic."""
        worst = 0.0
        per_z = {}
        for _, dt, prec in gate_dtypes:
            p = make_painter(dtype=dt)
            for z in val_ds.redshifts:
                az, cz, _ = pk_errors(p, val_ds, seed=args.seed, z=z,
                                      n_sample=args.eval_tiles,
                                      matmul_precision=prec)
                per_z[z] = max(per_z.get(z, 0.0), az, cz)
                worst = max(worst, az, cz)
        return (worst, per_z) if return_per_z else worst

    def retarget_boost(per_z, worst):
        """'--z-boost auto': give the binding redshift(s) — within 80% of
        the worst per-z gate value — `auto_boost` batch shares each. Returns
        a description when the targeting changed."""
        binding = {z for z, v in per_z.items() if v >= 0.8 * worst}
        new = {z: (auto_boost if z in binding else 1) for z in zs}
        if new == shares:
            return ""
        shares.update(new)
        return ("  boost-> " +
                ",".join(f"z={z:g}" for z in sorted(binding)))

    best = (float("inf"), None)
    if (args.eval_every and args.resume and n_steps
            and not args.select_within_run):
        if os.path.exists(ckpt_base + "_state.msgpack"):
            # seed the selection with the restored state's own gate score so
            # a refinement run can never regress the saved best checkpoint
            worst0, per_z0 = gate_metric(return_per_z=True)
            best = (worst0, jax.device_get(trainer.state))
            mark0 = retarget_boost(per_z0, worst0) if auto_boost else ""
            print(f"  eval @ start: gate = {best[0]:.4f} (selection floor)"
                  f"{mark0}", file=sys.stderr, flush=True)

    # Dataset-geometry provenance: stamped into every saved checkpoint's
    # meta so promotion can derive (and cross-check) the --eval-only flags
    # instead of trusting a hand-typed --eval-args to reproduce the run's
    # validation data (a forgotten --physical would score the committed
    # gate against easier, mismatched statistics).
    dataset_geometry = {
        "tile": args.tile, "redshifts": args.redshifts,
        "n_stack": args.n_stack, "physical": bool(args.physical),
        "pressure_noise": args.pressure_noise, "seed": args.seed,
    }

    def save_with_geometry(base):
        trainer.save(base)
        fn = base + "_meta.json"
        with open(fn) as f:
            meta_d = json.load(f)
        meta_d["fidelity_dataset"] = dataset_geometry
        with open(fn, "w") as f:
            json.dump(meta_d, f, indent=1)

    def maybe_eval(done):
        nonlocal best
        if not args.eval_every or done % args.eval_every >= args.scan:
            return
        worst, per_z = gate_metric(return_per_z=True)
        mark = ""
        if worst < best[0]:
            best = (worst, jax.device_get(trainer.state))
            # persist immediately: a tunnel drop mid-run must not lose the
            # best state (observed: silent process death at step 1250)
            save_with_geometry(ckpt_base + "_best")
            mark = "  <- best (saved)"
        if auto_boost:
            mark += retarget_boost(per_z, worst)
        print(f"  eval @ {done}: gate max_z max(auto,cross) = "
              f"{worst:.4f}{mark}", file=sys.stderr, flush=True)

    gn_window_max = 0.0  # pre-clip |g| max over ALL scans since last print
    while done < n_steps:
        k = min(args.scan, n_steps - done)
        idx = np.stack([step_indices(done + j) for j in range(k)])
        # fiducial-style step decay over the run
        if args.model == "cvae":
            lr = args.lr * (0.5 ** (4 * done // n_steps))
            m = trainer.step_scan(idx, lr=lr, alpha_var=args.alpha_var,
                                  beta_KL=args.beta_kl)
            record(m, k, done)
            done += k
            maybe_eval(done)
        else:
            # CGAN: lr 5e-5 decayed 0.85 per 1568-sample pepoch; with the
            # spectral fine-tune on, use --lr directly (no pepoch decay)
            if args.pk_loss_weight > 0:
                lr = args.lr
            else:
                pepoch = done * args.batch // 1568
                lr = args.lr * (0.85 ** pepoch)
            m = trainer.step_scan(idx, lr=lr)
            record(m, k, done)
            m = {"elbo": m["loss_G_adv"],
                 **({"grad_norm": m["grad_norm"]} if "grad_norm" in m else {})}
            done += k
            maybe_eval(done)
        if "grad_norm" in m:   # pre-clip global norm (clip_grad_norm)
            gn_window_max = max(gn_window_max,
                                float(np.asarray(m["grad_norm"]).max()))
        if done % (args.scan * 8) < args.scan:
            elbo = float(np.asarray(m["elbo"]).reshape(-1)[-1])
            rate = done * args.batch / (time.time() - t0)
            gn = ""
            if "grad_norm" in m:
                g = np.asarray(m["grad_norm"]).reshape(-1)
                # window max covers every scan since the last print, not
                # just this one — spikes are the thing this line exists for
                gn = f" |g|={g[-1]:.2e} (window max {gn_window_max:.2e})"
                gn_window_max = 0.0
            print(f"step {done}/{n_steps} elbo={elbo:.3e}{gn} "
                  f"({rate:.0f} samples/s)", file=sys.stderr, flush=True)

    if not args.eval_only:
        if args.eval_every and n_steps:
            final = gate_metric()
            print(f"  eval @ end: gate = {final:.4f} "
                  f"(best seen {best[0]:.4f})", file=sys.stderr, flush=True)
            if best[1] is not None and best[0] < final:
                trainer.state = jax.device_put(best[1])
                print("  restored best-gate parameters",
                      file=sys.stderr, flush=True)
        save_with_geometry(ckpt_base)
        if stats is not None:
            stats.flush_to_file()
    painter = make_painter(dtype=gate_dtypes[0][1])
    if args.save_figures:
        if trainer.test_data is None:
            trainer.test_data = val_ds
        trainer.validate(
            save_plots=True,
            filename_template=os.path.join(
                args.workdir, f"{args.model}_{{plot_type}}.png"))
        print(f"figures saved in {args.workdir}", file=sys.stderr, flush=True)
    auto1, cross1, diag1 = pk_errors(painter, val_ds, seed=args.seed,
                                     n_sample=args.eval_tiles,
                                     matmul_precision=gate_dtypes[0][2])
    # the gate is per-redshift (validation_plotting.py:76-158 panels per z),
    # and under --gate-dtype both it must hold for every compute dtype
    per_z_by_dtype = {}
    for label, dtp, prec in gate_dtypes:
        p = (painter if (dtp, prec) == gate_dtypes[0][1:]
             else make_painter(dtype=dtp))
        d = {}
        for z in val_ds.redshifts:
            az, cz, _ = pk_errors(p, val_ds, seed=args.seed, z=z,
                                      n_sample=args.eval_tiles,
                                  matmul_precision=prec)
            d[f"{z:g}"] = {"auto": round(az, 4), "cross": round(cz, 4)}
        per_z_by_dtype[label] = d
    per_z = per_z_by_dtype[gate_dtypes[0][0]]
    dt = time.time() - t0
    print(json.dumps({
        "metric": "pk_fractional_error_after_training",
        "model": args.model,
        "auto_untrained": round(auto0, 4), "cross_untrained": round(cross0, 4),
        "auto": round(auto1, 4), "cross": round(cross1, 4),
        "n_samples": 0 if args.eval_only else args.n_samples,
        "tile": args.tile,
        "physical_stats": bool(args.physical),
        "train_seconds": 0.0 if args.eval_only else round(dt, 1),
        "samples_per_sec": (0.0 if args.eval_only
                            else round(args.n_samples / dt, 1)),
        "auto_clipped": round(diag1["auto_clipped"], 4),
        "mean_ratio": round(diag1["mean_ratio"], 4),
        "std_ratio": round(diag1["std_ratio"], 4),
        "gate_dtype": args.gate_dtype,
        "per_z": per_z,
        **({"per_z_by_dtype": per_z_by_dtype} if len(gate_dtypes) > 1 else {}),
        "pass_5pct": bool(all(v["auto"] < 0.05 and v["cross"] < 0.05
                              for d in per_z_by_dtype.values()
                              for v in d.values())),
    }))


if __name__ == "__main__":
    main()
