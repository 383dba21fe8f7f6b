"""Painter API tests: paint/paint_batch, checkpoint load, transforms."""
import jax
import numpy as np
import pytest

from baryon_painter_tpu.data.dataset import BahamasTileDataset, load_file_info
from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
from baryon_painter_tpu.models.cvae import CVAE, fiducial_cvae_architecture
from baryon_painter_tpu.painter import CVAEPainter
from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
from baryon_painter_tpu.transforms import RangeCompress

# quick-tier exclusion: painter paint-graph compiles (run with the full suite)
pytestmark = pytest.mark.slow

TILE = 32


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stacks"))
    info = make_synthetic_stacks(root, n_stack=2, n_grid=64,
                                 redshifts=(0.0, 1.0))
    ds = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    arch = fiducial_cvae_architecture(tile_size=TILE, n_res_blocks=1)
    tr = CVAETrainer(CVAE(arch), ds, config=TrainConfig(seed=0))
    tr.step(ds.get_raw_batch(np.arange(4)), lr=1e-3)  # populate batch_stats
    return tr


@pytest.fixture(scope="module")
def painter(trainer):
    return CVAEPainter.from_trainer(trainer)


def test_paint_single_tile(painter, trainer):
    tile = trainer.training_data.get_input_sample(3, transform=False)
    out = painter.paint(tile, z=0.5)
    assert out.shape == (TILE, TILE)
    assert np.all(np.isfinite(out))
    # softplus mu head + shift-log inverse -> strictly positive pressures
    assert np.all(out > 0)


def test_paint_shape_check(painter):
    with pytest.raises(ValueError):
        painter.paint(np.zeros((TILE + 1, TILE + 1)), z=0.0)
    with pytest.raises(ValueError):
        painter.paint(np.zeros((2, TILE, TILE)), z=0.0)


def test_paint_batch_matches_single(painter, trainer):
    tiles = np.stack([trainer.training_data.get_input_sample(i, transform=False)
                      for i in range(3)])
    zs = np.array([0.0, 0.5, 1.0], np.float32)
    rng = jax.random.PRNGKey(7)
    batch = np.asarray(painter.paint_batch(tiles, zs, rng=rng))
    assert batch.shape == (3, TILE, TILE)
    # determinism with a fixed rng
    batch2 = np.asarray(painter.paint_batch(tiles, zs, rng=rng))
    np.testing.assert_allclose(batch, batch2)
    # the latent prior draw itself is stochastic (the *decoded* output of an
    # untrained model is nearly z-insensitive: BN-eval + ReLU attenuate the
    # 1-channel p_z_in path ~1e5x, same as the reference architecture)
    m, ds = painter.model, trainer.training_data
    y = np.asarray(ds.transform(tiles, "dm", zs))[..., None]
    z1 = m.apply(painter.variables, y, zs, train=False,
                 rngs={"sample": jax.random.PRNGKey(1)},
                 method=m.sample_prior)
    z2 = m.apply(painter.variables, y, zs, train=False,
                 rngs={"sample": jax.random.PRNGKey(2)},
                 method=m.sample_prior)
    assert float(np.abs(np.asarray(z1) - np.asarray(z2)).max()) > 0.1


def test_paint_z_modes(painter, trainer):
    tiles = np.stack([trainer.training_data.get_input_sample(i, transform=False)
                      for i in range(2)])
    zs = np.zeros(2, np.float32)
    mean1 = np.asarray(painter.paint_batch(tiles, zs, z_mode="mean",
                                           rng=jax.random.PRNGKey(1)))
    mean2 = np.asarray(painter.paint_batch(tiles, zs, z_mode="mean",
                                           rng=jax.random.PRNGKey(2)))
    np.testing.assert_allclose(mean1, mean2)  # rng-independent
    zero = np.asarray(painter.paint_batch(tiles, zs, z_mode="zero",
                                          rng=jax.random.PRNGKey(1)))
    assert zero.shape == mean1.shape
    assert np.all(np.isfinite(zero))


def test_paint_return_var(painter, trainer):
    tile = trainer.training_data.get_input_sample(0, transform=False)
    mu, var = painter.paint(tile, z=0.0, return_var=True)
    assert mu.shape == var.shape == (TILE, TILE)
    assert np.all(var > 0)


def test_paint_without_transforms(painter, trainer):
    """transform=False consumes already-transformed input; inverse off
    returns the model-space output."""
    ds = trainer.training_data
    raw = ds.get_input_sample(1, transform=False)
    pre = np.asarray(ds.transform(raw, "dm", ds.sample_idx_to_redshift(1)))
    rng = jax.random.PRNGKey(0)
    a = np.asarray(painter.paint_batch(pre[None], np.zeros(1), transform=False,
                                       inverse_transform=False, rng=rng))
    b = np.asarray(painter.paint_batch(raw[None], np.zeros(1), transform=True,
                                       inverse_transform=False, rng=rng))
    z0 = ds.sample_idx_to_redshift(1)
    # same pipeline up to the host-side transform (z=0 == z of sample 0 grid)
    assert a.shape == b.shape == (1, TILE, TILE)


def test_painter_train_surface(trainer, tmp_path):
    """Reference-style flow: CVAEPainter(datasets, architecture).train()
    then paint (painter.py:34-47,60)."""
    from baryon_painter_tpu.models.cvae import fiducial_cvae_architecture
    ds = trainer.training_data
    arch = fiducial_cvae_architecture(tile_size=TILE, n_res_blocks=1)
    p = CVAEPainter(training_data_set=ds, test_data_set=ds,
                    architecture=arch)
    with pytest.raises(AttributeError):
        p.paint(np.zeros((TILE, TILE)))  # not trained yet -> no paint fn
    tstats, vstats = p.train(n_pepoch=1, pepoch_size=8, batch_size=4,
                             learning_rate=1e-3,
                             statistics_report_frequency=0,
                             validation_loss_frequency=10**9,
                             checkpoint_frequency=10**9)
    assert tstats.n_batches >= 2
    out = p.paint(ds.get_input_sample(0, transform=False), z=0.0)
    assert out.shape == (TILE, TILE)
    figs = p.validate(validation_batch_size=2, plot_power_spectra=["auto"],
                      plot_histogram=[])
    assert "sample" in figs


def test_checkpoint_roundtrip_painting(painter, trainer, tmp_path):
    base = str(tmp_path / "model")
    painter.save_state_to_file(base)
    p2 = CVAEPainter(base)
    tile = trainer.training_data.get_input_sample(2, transform=False)
    rng = jax.random.PRNGKey(3)
    out1 = np.asarray(painter.paint_batch(tile[None], np.zeros(1), rng=rng))
    out2 = np.asarray(p2.paint_batch(tile[None], np.zeros(1), rng=rng))
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-6)


def test_from_trainer_dtype_override(trainer):
    """from_trainer(dtype=...) rebuilds the paint model in that compute
    dtype over the same parameters: the fidelity gate scores checkpoints
    under portable f32 AND the training dtype (a fine-tune selected on one
    platform's bf16 rounding alone scored 17x worse under another's)."""
    import jax.numpy as jnp
    p_keep = CVAEPainter.from_trainer(trainer)
    p_f32 = CVAEPainter.from_trainer(trainer, dtype=None)
    p_bf16 = CVAEPainter.from_trainer(trainer, dtype=jnp.bfloat16)
    assert p_f32.model.dtype is None
    assert p_bf16.model.dtype == jnp.bfloat16
    assert p_keep.model is trainer.model
    tile = trainer.training_data.get_input_sample(1, transform=False)
    rng = jax.random.PRNGKey(11)
    outs = [np.asarray(p.paint_batch(tile[None], np.zeros(1), rng=rng))
            for p in (p_keep, p_f32, p_bf16)]
    # same params, same prior draws -> close but not identical across dtypes
    for o in outs:
        assert np.all(np.isfinite(o))
    np.testing.assert_allclose(outs[1], outs[2], rtol=0.15, atol=0.15)
