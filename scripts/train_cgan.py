#!/usr/bin/env python
"""CGAN training driver with the reference hyperparameters
(trained_models/README.md:130-139: lr 5e-5, Adam (0.5, 0.999),
lambda_perceptual 2.5, lr decay 0.85 per 1568-sample pepoch, batch 6)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from baryon_painter_tpu.utils.platform import (
        enable_compilation_cache, respect_env_platform)
    respect_env_platform()
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--data-path")
    p.add_argument("--files-info", default="train_files_info.pickle")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-grid", type=int, default=256)
    p.add_argument("--output-path", required=True)
    p.add_argument("--n-tile", type=int, default=4,
                   help="tiles per stack side; tile size n_grid/n_tile must "
                        "be >= 32 for the discriminator")
    p.add_argument("--n-pepoch", type=int, default=96)
    p.add_argument("--batch-size", type=int, default=6)
    p.add_argument("--n-res-blocks", type=int, default=9)
    p.add_argument("--lambda-perceptual", type=float, default=2.5)
    p.add_argument("--device-data", action="store_true",
                   help="stage stacks in HBM and assemble batches on device")
    p.add_argument("--keep-last-checkpoints", type=int, default=0,
                   help="rotate periodic checkpoints, keeping only the "
                        "newest N (0 = keep all, the reference behavior)")
    p.add_argument("--clip-grad", type=float, default=0.0,
                   help="global-norm gradient clip for G and D, 0 = off "
                        "(CGANTrainConfig.clip_grad_norm)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()

    from baryon_painter_tpu.data.dataset import (BahamasTileDataset,
                                                 load_file_info)
    from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
    from baryon_painter_tpu.models.cgan import (CGANDiscriminator,
                                                CGANGenerator)
    from baryon_painter_tpu.train.cgan import CGANTrainConfig, CGANTrainer
    from baryon_painter_tpu.transforms import RangeCompress

    if args.synthetic:
        data_path = os.path.join(args.output_path, "synthetic_data")
        info = make_synthetic_stacks(data_path, n_stack=4,
                                     n_grid=args.synthetic_grid,
                                     redshifts=(0.0, 0.5, 1.0, 2.0),
                                     seed=args.seed, name="train")
    else:
        if not args.data_path:
            p.error("--data-path is required without --synthetic")
        data_path = args.data_path
        info = os.path.join(data_path, args.files_info)

    ds = BahamasTileDataset(
        files=load_file_info(info), root_path=data_path,
        label_fields=["pressure"], n_tile=args.n_tile,
        tile_permutations=True,
        transforms={"dm": RangeCompress("shift-log", 4.0, eps=1e-4),
                    "pressure": RangeCompress("shift-log", 4.0, eps=1e-4)})

    cfg = CGANTrainConfig(batch_size=args.batch_size,
                          n_pepoch=args.n_pepoch,
                          lambda_perceptual=args.lambda_perceptual,
                          output_path=args.output_path, seed=args.seed,
                          keep_last_checkpoints=args.keep_last_checkpoints,
                          clip_grad_norm=args.clip_grad,
                          verbose=args.verbose)
    trainer = CGANTrainer(ds, config=cfg,
                          generator=CGANGenerator(n_res_blocks=args.n_res_blocks),
                          discriminator=CGANDiscriminator(),
                          device_data=args.device_data)
    stats, _val_stats = trainer.train()
    print(f"done: {stats.n_processed_samples[-1]} samples; "
          f"loss_D mavg {stats.loss_terms['loss_D']['mavg'][-1]:.4f}")


if __name__ == "__main__":
    main()
