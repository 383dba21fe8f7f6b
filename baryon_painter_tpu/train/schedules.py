"""Pepoch-driven training schedules.

The reference drives training in 'pseudo-epochs' (pepoch = fixed number of
samples, painter.py:74-77) with callables mapping pepoch -> lr multiplier /
batch size (scripts/CVAE_single_scale.py:151-172). Same here, as plain
functions; the trainer injects the lr through optax so changing it does NOT
trigger a recompile.
"""
from __future__ import annotations

__all__ = ["fiducial_adaptive_batch_size", "fiducial_adaptive_lr",
           "step_lr", "linear_anneal"]


def fiducial_adaptive_batch_size(pepoch: int, min_batch_size: int = 1,
                                 max_batch_size: int = 24) -> int:
    """Batch ramp 4 -> 8 -> 16 -> 24 at pepochs 0/8/16/32
    (CVAE_single_scale.py:151-158)."""
    steps = [(0, 4), (8, 8), (16, 16), (32, 24)]
    for start, size in reversed(steps):
        if pepoch >= start:
            return min(size, max_batch_size)
    return min_batch_size


def fiducial_adaptive_lr(pepoch: int, step: int = 32, min_pepoch: int = 32,
                         gamma: float = 0.5, min_gamma: float = 1e-6) -> float:
    """LR multiplier: 1 until min_pepoch, then gamma^((pepoch-min_pepoch)//step)
    floored at min_gamma (CVAE_single_scale.py:160-172, 'slow' variant)."""
    if pepoch < min_pepoch:
        return 1.0
    return max(min_gamma, gamma ** ((pepoch - min_pepoch) // step))


def step_lr(step_size: int, gamma: float):
    """StepLR-equivalent multiplier (painter.py:97-100)."""
    def fn(pepoch: int) -> float:
        return gamma ** (pepoch // step_size)
    return fn


def linear_anneal(start_pepoch: int, end_pepoch: int,
                  start_value: float = 0.0, end_value: float = 1.0):
    """Linear ramp for alpha_var / beta_KL annealing (painter.py:192-195)."""
    def fn(pepoch: int) -> float:
        if pepoch <= start_pepoch:
            return start_value
        if pepoch >= end_pepoch:
            return end_value
        w = (pepoch - start_pepoch) / (end_pepoch - start_pepoch)
        return start_value + w * (end_value - start_value)
    return fn
