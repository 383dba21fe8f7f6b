#!/usr/bin/env python
"""Fiducial CVAE training driver.

TPU-native equivalent of the reference's scripts/CVAE_single_scale.py:
shift-log (k=4) transforms, 11 redshifts, train/validation split by stack
offset, adaptive batch ramp 4->24 and step lr decay, 256 pepochs of 1568
samples. `--synthetic` trains against generated stacks for smoke runs.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIDUCIAL_REDSHIFTS = [0.0, 0.125, 0.25, 0.375, 0.5, 0.75, 1.0, 1.25, 1.5,
                      1.75, 2.0]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", help="directory with stacks + files-info pickle")
    p.add_argument("--files-info", default="train_files_info.pickle")
    p.add_argument("--synthetic", action="store_true",
                   help="generate synthetic stacks instead of loading BAHAMAS")
    p.add_argument("--synthetic-grid", type=int, default=256)
    p.add_argument("--output-path", required=True)
    p.add_argument("--tile-size", type=int, default=None,
                   help="override tile size (default: n_grid // n_tile)")
    p.add_argument("--n-tile", type=int, default=4)
    p.add_argument("--n-training-stack", type=int, default=11)
    p.add_argument("--n-validation-stack", type=int, default=3)
    p.add_argument("--n-pepoch", type=int, default=256)
    p.add_argument("--pepoch-size", type=int, default=1568)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--n-res-blocks", type=int, default=4)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--device-data", action="store_true",
                   help="stage stacks in HBM and assemble batches on device")
    p.add_argument("--resume-from",
                   help="checkpoint base path to resume training from "
                        "(restores params, batch stats, optimizer state, "
                        "loop progress, data-rng state and step counter)")
    p.add_argument("--config",
                   help="declarative run-config JSON (train/run_config.py); "
                        "covers architecture + transforms + schedules + "
                        "trainer scalars; CLI flags override its values")
    p.add_argument("--profile", metavar="LOG_DIR", default=None,
                   help="wrap training in a jax.profiler device trace "
                        "written to LOG_DIR (TensorBoard-compatible) and "
                        "print per-dispatch wall-time percentiles")
    p.add_argument("--adaptive-lr", default=None,
                   choices=["fiducial", "avoid_plateau"],
                   help="lr schedule: 'fiducial' = the reference's step "
                        "decay (CVAE_single_scale.py:160-172); "
                        "'avoid_plateau' = the reference's "
                        "validation-reactive ReduceLROnPlateau mode "
                        "(painter.py:101-110: max-mode, factor 0.1, "
                        "patience 10 pepochs, rel threshold 1e-4), stepped "
                        "with the training-ELBO moving average and resumed "
                        "from checkpoints mid-plateau")
    p.add_argument("--pk-loss-weight", type=float, default=None,
                   help="spectral auxiliary loss weight (see "
                        "TrainConfig.pk_loss_weight)")
    p.add_argument("--pk-loss-per-z", action="store_true",
                   help="per-redshift masked spectral loss instead of a "
                        "pooled batch-mean (TrainConfig.pk_loss_per_z); "
                        "the P(k) gate is per-z, a pooled loss can trade "
                        "redshifts off against each other")
    p.add_argument("--clip-grad", type=float, default=None,
                   help="global-norm gradient clip, 0/None = off "
                        "(TrainConfig.clip_grad_norm)")
    p.add_argument("--keep-last-checkpoints", type=int, default=0,
                   help="rotate periodic checkpoints, keeping only the "
                        "newest N (0 = keep all, the reference behavior)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()

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
    from baryon_painter_tpu.train.run_config import RunConfig
    from baryon_painter_tpu.train.trainer import CVAETrainer
    from baryon_painter_tpu.transforms import transform_from_dict

    run_cfg = RunConfig.load(args.config) if args.config else None
    if run_cfg is not None and run_cfg.transforms:
        transforms = run_cfg.build_transforms()
    else:
        transforms = {
            f: transform_from_dict({"type": "range_compress",
                                    "mode": "shift-log", "k": 4.0,
                                    "eps": 1e-4})
            for f in ("dm", "pressure")}

    if args.synthetic:
        data_path = os.path.join(args.output_path, "synthetic_data")
        info = make_synthetic_stacks(
            data_path, n_stack=args.n_training_stack + args.n_validation_stack,
            n_grid=args.synthetic_grid, redshifts=tuple(FIDUCIAL_REDSHIFTS),
            seed=args.seed, name="train")
        redshifts = FIDUCIAL_REDSHIFTS
    else:
        if not args.data_path:
            p.error("--data-path is required without --synthetic")
        data_path = args.data_path
        info = os.path.join(data_path, args.files_info)
        redshifts = FIDUCIAL_REDSHIFTS

    common = dict(files=load_file_info(info), root_path=data_path,
                  redshifts=redshifts, label_fields=["pressure"],
                  n_tile=args.n_tile, transforms=transforms,
                  tile_permutations=True, scale_to_SLICS=True)
    training = BahamasTileDataset(n_stack=args.n_training_stack,
                                  stack_offset=args.n_validation_stack,
                                  **common)
    validation = BahamasTileDataset(data=training.data,
                                    n_stack=args.n_validation_stack,
                                    stack_offset=0, **{
                                        k: v for k, v in common.items()
                                        if k not in ("files", "root_path")})

    tile = args.tile_size or training.tile_size
    if run_cfg is not None and run_cfg.architecture:
        arch = run_cfg.architecture
    else:
        arch = fiducial_cvae_architecture(tile_size=tile,
                                          n_res_blocks=args.n_res_blocks)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if run_cfg is None:
        # assemble the declarative config for this run (fiducial schedules
        # as specs) so it lands in run_config.json + every checkpoint meta
        run_cfg = RunConfig(
            architecture=arch,
            transforms={f: t.to_dict() for f, t in transforms.items()},
            schedules={"batch_size_schedule": {"kind": "fiducial_batch"},
                       "lr_schedule": {"kind": "fiducial_lr"}},
            train=dict(validation_loss_frequency=72,
                       validation_loss_batch_size=24,
                       checkpoint_frequency=20000,
                       statistics_report_frequency=400,
                       mavg_window_size=50))
    overrides = dict(learning_rate=args.learning_rate,
                     n_pepoch=args.n_pepoch, pepoch_size=args.pepoch_size,
                     output_path=args.output_path, seed=args.seed,
                     keep_last_checkpoints=args.keep_last_checkpoints,
                     verbose=args.verbose)
    if args.pk_loss_weight is not None:
        overrides["pk_loss_weight"] = args.pk_loss_weight
        run_cfg.train["pk_loss_weight"] = args.pk_loss_weight
    if args.pk_loss_per_z:
        overrides["pk_loss_per_z"] = True
        run_cfg.train["pk_loss_per_z"] = True
    if args.clip_grad is not None:
        overrides["clip_grad_norm"] = args.clip_grad
        run_cfg.train["clip_grad_norm"] = args.clip_grad
    if args.adaptive_lr is not None:
        run_cfg.schedules["lr_schedule"] = (
            {"kind": "fiducial_lr"} if args.adaptive_lr == "fiducial"
            else {"kind": "avoid_plateau"})
    cfg = run_cfg.build_train_config(**overrides)

    os.makedirs(args.output_path, exist_ok=True)
    run_cfg.save(os.path.join(args.output_path, "run_config.json"))
    trainer = CVAETrainer(CVAE(arch, dtype=dtype), training,
                          test_data=validation, config=cfg,
                          device_data=args.device_data)
    trainer.run_config = run_cfg
    if args.resume_from:
        trainer.restore(args.resume_from)
        print(f"resumed from {args.resume_from} at step "
              f"{int(trainer.state.step)}")

    def on_validation(tr, pepoch):
        tr.validate(validation_batch_size=8, plot_sample_var=True,
                    plot_power_spectra=["auto", "cross"],
                    plot_histogram=["log"], save_plots=True,
                    filename_template=os.path.join(
                        args.output_path,
                        f"{{plot_type}}_pepoch{pepoch}.png"))

    validation_pepochs = (0, 1, 2, 5, 10, 15, 20, 30, 40, 50, 60, 70, 80,
                          90, 100, 120, 140, 160, 180, 200, 230)
    from baryon_painter_tpu.utils.profiling import device_trace
    with device_trace(args.profile):
        tstats, vstats = trainer.train(validation_pepochs=validation_pepochs,
                                       on_validation=on_validation)
    if args.profile:
        print(f"device trace written to {args.profile} "
              "(view with TensorBoard's profile plugin)")
    print(f"done: {tstats.n_processed_samples[-1]} samples; final ELBO mavg "
          f"{tstats.loss_terms['ELBO']['mavg'][-1]:.4e}")


if __name__ == "__main__":
    main()
