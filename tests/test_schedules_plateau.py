"""ReduceLROnPlateau schedule: torch-oracle parity, trainer wiring, resume.

The reference's ``adaptive_learning_rate="avoid_plateau"`` constructs
``torch.optim.lr_scheduler.ReduceLROnPlateau(mode="max", factor=0.1,
patience=10, threshold=1e-4, threshold_mode="rel", cooldown=0, min_lr=0)``
and steps it once per pepoch with the current ELBO
(/root/reference/baryon_painter/painter.py:101-110,186-190).
"""
import numpy as np
import pytest

from baryon_painter_tpu.train.schedules import ReduceLROnPlateau


def _torch_trajectory(metrics, **kw):
    import torch

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, **kw)
    out = []
    for m in metrics:
        sched.step(m)
        out.append(opt.param_groups[0]["lr"])
    return out


@pytest.mark.parametrize("mode,threshold_mode", [
    ("max", "rel"), ("max", "abs"), ("min", "rel"), ("min", "abs")])
def test_matches_torch_oracle(mode, threshold_mode):
    rng = np.random.default_rng(42)
    # a drifting + noisy metric sequence exercises improve/plateau/cooldown
    metrics = np.cumsum(rng.normal(0.05, 1.0, size=120)) + 50.0
    kw = dict(mode=mode, factor=0.5, patience=3, threshold=1e-3,
              threshold_mode=threshold_mode, cooldown=2)
    ours = ReduceLROnPlateau(min_mult=1e-6, **kw)
    got = [ours.observe(m) for m in metrics]
    want = _torch_trajectory(metrics, min_lr=1e-6, **kw)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_reference_defaults_reduce_on_plateau():
    s = ReduceLROnPlateau()  # the reference's avoid_plateau parameters
    assert s() == 1.0
    s.observe(100.0)
    for _ in range(10):  # patience=10: ten bad pepochs are tolerated
        assert s.observe(100.0) == 1.0
    assert s.observe(100.0) == pytest.approx(0.1)  # the 11th reduces
    # callable form (pepoch -> multiplier) reports the reduced value
    assert s(123) == pytest.approx(0.1)


def test_state_array_roundtrip():
    s = ReduceLROnPlateau(patience=1, factor=0.5)
    for m in [3.0, 1.0, 1.0, 1.0, 2.0]:
        s.observe(m)
    s2 = ReduceLROnPlateau(patience=1, factor=0.5)
    s2.load_state_array(s.state_array())
    assert (s2.best, s2.num_bad, s2.cooldown_counter, s2.multiplier) == \
        (s.best, s.num_bad, s.cooldown_counter, s.multiplier)
    # identical continuations
    for m in [2.0, 2.0, 2.0]:
        assert s.observe(m) == s2.observe(m)


def test_run_config_spec():
    from baryon_painter_tpu.train.run_config import schedule_from_spec

    s = schedule_from_spec({"kind": "avoid_plateau", "patience": 2,
                            "factor": 0.5})
    assert isinstance(s, ReduceLROnPlateau)
    assert s.patience == 2 and s.factor == 0.5


@pytest.mark.slow
def test_trainer_plateau_wiring_and_resume(tmp_path):
    """The trainer observes the ELBO at pepoch boundaries, reduces the lr
    on plateau, and checkpoints the scheduler state ("lr_sched")."""
    from baryon_painter_tpu.data.dataset import (BahamasTileDataset,
                                                 load_file_info)
    from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
    from baryon_painter_tpu.models.cvae import (CVAE,
                                                fiducial_cvae_architecture)
    from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
    from baryon_painter_tpu.transforms import RangeCompress

    root = str(tmp_path / "stacks")
    info = make_synthetic_stacks(root, n_stack=2, n_grid=64,
                                 redshifts=(0.0, 1.0))
    ds = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    arch = fiducial_cvae_architecture(tile_size=32, n_res_blocks=1)
    # abs threshold 1e12: after the first observe every pepoch is "bad",
    # patience=0 reduces at every boundary — deterministic regardless of
    # the actual ELBO trajectory
    sched = ReduceLROnPlateau(patience=0, factor=0.5, threshold=1e12,
                              threshold_mode="abs")
    out = str(tmp_path / "run")
    cfg = TrainConfig(learning_rate=1e-3, batch_size=4, seed=0,
                      n_pepoch=3, pepoch_size=8,
                      adaptive_learning_rate=sched,
                      validation_loss_frequency=0,
                      statistics_report_frequency=0, output_path=out)
    tr = CVAETrainer(CVAE(arch), ds, config=cfg)
    tr.train()
    # boundaries at pepoch 1 and 2 fired (the pepoch-3 boundary breaks the
    # loop before schedules run): observe #1 sets best, observe #2 reduces
    assert sched.multiplier == pytest.approx(0.5)

    # resume restores the scheduler state into a fresh schedule object
    sched2 = ReduceLROnPlateau(patience=0, factor=0.5, threshold=1e12,
                               threshold_mode="abs")
    cfg2 = TrainConfig(learning_rate=1e-3, batch_size=4, seed=0,
                       adaptive_learning_rate=sched2)
    tr2 = CVAETrainer(CVAE(arch), ds, config=cfg2)
    import os
    tr2.restore(os.path.join(out, "model"))
    assert sched2.multiplier == pytest.approx(sched.multiplier)
    assert sched2.best == pytest.approx(sched.best)
