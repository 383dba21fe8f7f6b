"""Trainer.validate() diagnostics + model statistics helpers."""
import numpy as np
import pytest

from baryon_painter_tpu.data.dataset import BahamasTileDataset, load_file_info
from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
from baryon_painter_tpu.models.cvae import (CVAE, count_parameters,
                                            fiducial_cvae_architecture,
                                            print_model_statistics)
from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
from baryon_painter_tpu.transforms import RangeCompress

# quick-tier exclusion: full validate() figure pipeline (run with the full suite)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stacks"))
    info = make_synthetic_stacks(root, n_stack=2, n_grid=64,
                                 redshifts=(0.0, 1.0))
    ds = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    arch = fiducial_cvae_architecture(tile_size=32, n_res_blocks=1)
    tr = CVAETrainer(CVAE(arch), ds, test_data=ds,
                     config=TrainConfig(seed=0))
    tr.step(ds.get_raw_batch(np.arange(2)), lr=1e-3)
    return tr


def test_validate_compute_loss(trainer):
    stats = trainer.validate(validation_batch_size=2, compute_loss=True)
    assert len(stats) == len(trainer.model.get_stats_labels())
    assert all(np.isfinite(s) for s in stats)


def test_validate_plots(trainer, tmp_path):
    figs = trainer.validate(validation_batch_size=2, plot_sample_var=True,
                            plot_power_spectra=["auto", "cross"],
                            plot_histogram=["log"], save_plots=True,
                            filename_template=str(tmp_path / "{plot_type}.png"))
    assert set(figs) == {"sample", "auto_power_spectrum",
                         "cross_power_spectrum", "log_histogram"}
    assert (tmp_path / "sample.png").exists()
    assert (tmp_path / "auto_power_spectrum.png").exists()


def test_validate_fixed_redshift(trainer):
    stats = trainer.validate(validation_batch_size=2, compute_loss=True,
                             validation_redshift=1.0)
    assert np.isfinite(stats[0])


def test_model_statistics(trainer, capsys):
    n = count_parameters(trainer.state.params)
    assert n > 1e5
    total = print_model_statistics(trainer.state.params)
    assert total == n
    out = capsys.readouterr().out
    assert "Total number of parameters" in out


def test_dataset_transform_callables(trainer):
    ds = trainer.training_data
    tfs = ds.get_transforms(z=0.0)
    invs = ds.get_inverse_transforms(idx=0)
    assert len(tfs) == len(ds.fields)
    x = np.abs(np.random.default_rng(0).standard_normal((8, 8))) + 0.1
    rec = np.asarray(invs[0](tfs[0](x)))
    np.testing.assert_allclose(rec, x, rtol=1e-3, atol=1e-4)
    with pytest.raises(ValueError):
        ds.get_transforms()
