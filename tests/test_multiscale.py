"""Multi-scale (split-scale) training and painting: n_scale > 1 channels."""
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.data.dataset import BahamasTileDataset, load_file_info
from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
from baryon_painter_tpu.models.cvae import CVAE, fiducial_cvae_architecture
from baryon_painter_tpu.painter import CVAEPainter
from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
from baryon_painter_tpu.transforms import (ChainTransform, RangeCompress,
                                           SplitScale)

# quick-tier exclusion: split-scale trainer compiles (run with the full suite)
pytestmark = pytest.mark.slow

N_SCALE = 2
TILE = 32


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stacks"))
    info = make_synthetic_stacks(root, n_stack=2, n_grid=64,
                                 redshifts=(0.0, 1.0))
    multi = ChainTransform(steps=(RangeCompress("shift-log", 4.0),
                                  SplitScale(n_scale=N_SCALE, step_size=2,
                                             include_original=False)))
    return BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        transforms={"dm": multi, "pressure": multi})


def test_multiscale_transform_shapes(dataset):
    x = dataset.get_input_sample(3, transform=True)
    assert x.shape == (N_SCALE, TILE, TILE)
    # inverse reassembles the bands and undoes the compression
    raw = dataset.get_input_sample(3, transform=False)
    z = dataset.sample_idx_to_redshift(3)
    rec = np.asarray(dataset.inverse_transform(x, "dm", z))
    np.testing.assert_allclose(rec, raw, rtol=1e-2, atol=1e-3)


def test_multiscale_train_and_paint(dataset):
    arch = fiducial_cvae_architecture(tile_size=TILE, n_scale=N_SCALE,
                                      n_res_blocks=1)
    tr = CVAETrainer(CVAE(arch), dataset, config=TrainConfig(seed=0))
    m = tr.step(dataset.get_raw_batch(np.arange(2)), lr=1e-3)
    assert np.isfinite(float(m["elbo"]))
    assert np.asarray(m["log_likelihood"]).shape == (N_SCALE,)

    painter = CVAEPainter.from_trainer(tr)
    tile = dataset.get_input_sample(0, transform=False)
    out = painter.paint(tile, z=1.0)
    # multi-channel model output inverse-transformed back to one tile
    assert out.shape == (TILE, TILE)
    assert np.all(np.isfinite(out))
