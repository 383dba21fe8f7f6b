"""Training engine: fused jit steps, schedules, stats, checkpoints."""

from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig  # noqa: F401
