"""Multi-chip painting: tile batches sharded over a data-parallel mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from baryon_painter_tpu.data.dataset import BahamasTileDataset, load_file_info
from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
from baryon_painter_tpu.models.cvae import CVAE, fiducial_cvae_architecture
from baryon_painter_tpu.painter import CVAEPainter
from baryon_painter_tpu.parallel.mesh import data_parallel_mesh, replicate
from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
from baryon_painter_tpu.transforms import RangeCompress

# quick-tier exclusion: 8-device sharded paint compiles (run with the full suite)
pytestmark = pytest.mark.slow

TILE = 32


def test_paint_batch_sharded_over_mesh(tmp_path):
    """paint_batch on tiles sharded over 8 devices == unsharded results.

    This is the lightcone scaling path: each shell's tile batch splits
    across the chips of a slice; XLA partitions the whole transform ->
    decode -> inverse-transform graph with no code changes."""
    root = str(tmp_path / "stacks")
    info = make_synthetic_stacks(root, n_stack=2, n_grid=64,
                                 redshifts=(0.0, 1.0))
    ds = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    arch = fiducial_cvae_architecture(tile_size=TILE, n_res_blocks=1)
    tr = CVAETrainer(CVAE(arch), ds, config=TrainConfig(seed=0))
    tr.step(ds.get_raw_batch(np.arange(2)), lr=1e-3)
    painter = CVAEPainter.from_trainer(tr)

    tiles = np.stack([ds.get_input_sample(i, transform=False)
                      for i in range(8)])
    zs = np.linspace(0, 1, 8).astype(np.float32)
    rng = jax.random.PRNGKey(0)
    plain = np.asarray(painter.paint_batch(tiles, zs, rng=rng))

    mesh = data_parallel_mesh(8)
    assert mesh.size == 8
    painter.variables = replicate(painter.variables, mesh)
    tiles_sh = jax.device_put(jnp.asarray(tiles),
                              NamedSharding(mesh, P("data")))
    zs_sh = jax.device_put(jnp.asarray(zs), NamedSharding(mesh, P("data")))
    sharded = painter.paint_batch(tiles_sh, zs_sh, rng=rng)
    # output inherits the batch sharding (one shard per device)
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sharded), plain, rtol=2e-4,
                               atol=1e-5)
