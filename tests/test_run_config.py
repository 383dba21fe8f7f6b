"""Declarative run config: schedule specs, JSON round-trip, checkpoint meta."""
import json

import numpy as np
import pytest

from baryon_painter_tpu.train.run_config import RunConfig, schedule_from_spec
from baryon_painter_tpu.train.schedules import (fiducial_adaptive_batch_size,
                                                fiducial_adaptive_lr)


def test_schedule_specs_match_callables():
    fb = schedule_from_spec({"kind": "fiducial_batch"})
    fl = schedule_from_spec({"kind": "fiducial_lr"})
    for pe in (0, 7, 8, 31, 32, 64, 200):
        assert fb(pe) == fiducial_adaptive_batch_size(pe)
        assert fl(pe) == fiducial_adaptive_lr(pe)
    st = schedule_from_spec({"kind": "step", "step_size": 2, "gamma": 0.5})
    assert [st(p) for p in (0, 1, 2, 4)] == [1.0, 1.0, 0.5, 0.25]
    pw = schedule_from_spec({"kind": "piecewise", "boundaries": [2, 5],
                             "values": [1.0, 0.1, 0.01]})
    assert [pw(p) for p in (0, 2, 4, 5, 9)] == [1.0, 0.1, 0.1, 0.01, 0.01]
    la = schedule_from_spec({"kind": "linear_anneal", "start_pepoch": 0,
                             "end_pepoch": 4})
    assert la(2) == 0.5
    assert schedule_from_spec(None) is None
    assert schedule_from_spec({"kind": "constant", "value": 3})(17) == 3
    with pytest.raises(ValueError):
        schedule_from_spec({"kind": "nope"})
    with pytest.raises(ValueError):
        schedule_from_spec({"kind": "piecewise", "boundaries": [1],
                            "values": [1.0]})


@pytest.mark.slow
def test_run_config_roundtrip_reproduces_training(tmp_path):
    """config -> train 1 pepoch -> checkpoint -> rebuild EVERYTHING from the
    stored config -> identical state (VERDICT r1 item 10)."""
    from baryon_painter_tpu.data.dataset import (BahamasTileDataset,
                                                 load_file_info)
    from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
    from baryon_painter_tpu.models.cvae import fiducial_cvae_architecture
    from baryon_painter_tpu.train.checkpoint import load_checkpoint
    from baryon_painter_tpu.train.trainer import CVAETrainer

    cfg = RunConfig(
        architecture=fiducial_cvae_architecture(tile_size=32, n_res_blocks=1),
        transforms={f: {"type": "range_compress", "mode": "shift-log",
                        "k": 4.0, "eps": 1e-6, "sqrt_of_mean": False}
                    for f in ("dm", "pressure")},
        schedules={"batch_size_schedule": {"kind": "piecewise",
                                           "boundaries": [1], "values": [2, 4]},
                   "lr_schedule": {"kind": "step", "step_size": 1,
                                   "gamma": 0.5}},
        train=dict(learning_rate=1e-3, n_pepoch=1, pepoch_size=8, seed=11,
                   checkpoint_frequency=10 ** 9,
                   statistics_report_frequency=0, stats_sync_every=4))
    fn = str(tmp_path / "run.json")
    cfg.save(fn)
    cfg2 = RunConfig.load(fn)
    assert cfg2.to_dict() == cfg.to_dict()

    root = str(tmp_path / "stacks")
    info = make_synthetic_stacks(root, n_stack=2, n_grid=64,
                                 redshifts=(0.0, 1.0))

    def train_once(rc, outdir):
        ds = BahamasTileDataset(files=load_file_info(info), root_path=root,
                                n_tile=2, transforms=rc.build_transforms())
        tr = CVAETrainer(rc.build_model(), ds, test_data=ds,
                         config=rc.build_train_config(output_path=str(outdir)))
        tr.run_config = rc
        tr.train()
        return tr

    train_once(cfg2, tmp_path / "a")
    state_a, meta_a = load_checkpoint(str(tmp_path / "a" / "model"))
    assert meta_a["run_config"] == cfg.to_dict()  # config stored in ckpt

    # rebuild the run purely from the checkpoint's embedded config
    cfg3 = RunConfig.from_dict(meta_a["run_config"])
    train_once(cfg3, tmp_path / "b")
    state_b, _ = load_checkpoint(str(tmp_path / "b" / "model"))
    import jax
    for a, b in zip(jax.tree.leaves(state_a["params"]),
                    jax.tree.leaves(state_b["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with open(tmp_path / "a" / "training_stats.txt") as fa, \
            open(tmp_path / "b" / "training_stats.txt") as fb:
        assert fa.read() == fb.read()
