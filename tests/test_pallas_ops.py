"""Pallas kernels vs their XLA fallbacks (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.data.dataset import BahamasTileDataset, load_file_info
from baryon_painter_tpu.data.device_cache import DeviceStackCache
from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
from baryon_painter_tpu.ops.pallas_gather import (dihedral_batch,
                                                  dihedral_mxu,
                                                  dihedral_vmem,
                                                  gather_tiles_pallas)
from baryon_painter_tpu.transforms import RangeCompress

# quick-tier exclusion: pallas interpret-mode kernels (run with the full suite)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stacks"))
    info = make_synthetic_stacks(root, n_stack=3, n_grid=64,
                                 redshifts=(0.0, 0.5))
    return BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        tile_permutations=True,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})


def test_dihedral_vmem_matches_numpy(rng):
    from baryon_painter_tpu.data.indexing import dihedral_transform
    tile = jnp.asarray(rng.standard_normal((2, 8, 8)).astype(np.float32))
    for p in range(8):
        got = np.asarray(dihedral_vmem(tile, p))
        want = dihedral_transform(np.asarray(tile), p)
        np.testing.assert_array_equal(got, want)
        # the MXU (anti-identity matmul) formulation is exact too
        got_mxu = np.asarray(dihedral_mxu(tile, p))
        np.testing.assert_array_equal(got_mxu, want)
    # the batched transpose/reverse decomposition (the production path)
    perms = np.arange(8)
    tiles = jnp.broadcast_to(tile, (8,) + tile.shape)
    got_b = np.asarray(dihedral_batch(tiles, jnp.asarray(perms)))
    for p in range(8):
        from baryon_painter_tpu.data.indexing import dihedral_transform
        np.testing.assert_array_equal(got_b[p],
                                      dihedral_transform(np.asarray(tile), p))


def test_pallas_gather_matches_xla(dataset, rng):
    cache_xla = DeviceStackCache(dataset, use_pallas=False)
    cache_pl = DeviceStackCache(dataset, use_pallas=True)
    idx = rng.choice(len(dataset), size=8, replace=False)
    digits = cache_xla.digits(idx)

    in_x, lab_x, z_x = jax.jit(cache_xla.gather)(digits)
    in_p, lab_p, z_p = jax.jit(cache_pl.gather)(digits)
    np.testing.assert_allclose(np.asarray(in_p), np.asarray(in_x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lab_p), np.asarray(lab_x),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(z_p), np.asarray(z_x))


def test_res_block_pallas_matches_xla(rng):
    from baryon_painter_tpu.ops.pallas_conv import (fold_bn, res_block_infer,
                                                    res_block_infer_xla)
    n, h, w, c = 2, 16, 16, 8
    x = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32)) * 0.1
    s1, b1 = fold_bn(jnp.ones(c), jnp.zeros(c),
                     jnp.asarray(rng.standard_normal(c).astype(np.float32)) * 0.1,
                     jnp.abs(jnp.asarray(rng.standard_normal(c))) + 0.5)
    s2, b2 = fold_bn(jnp.full(c, 1.2), jnp.full(c, 0.1),
                     jnp.zeros(c), jnp.ones(c))
    got = np.asarray(res_block_infer(x, w1, s1, b1, w2, s2, b2,
                                     interpret=True))
    want = np.asarray(res_block_infer_xla(x, w1, s1, b1, w2, s2, b2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert np.all(got >= 0)  # final relu

    # LeakyReLU slopes (the CGAN generator's blocks): kernel == fallback,
    # and negative outputs exist (the leaky path is exercised)
    got = np.asarray(res_block_infer(x, w1, s1, b1, w2, s2, b2,
                                     interpret=True, inner_slope=0.2,
                                     outer_slope=0.2))
    want = np.asarray(res_block_infer_xla(x, w1, s1, b1, w2, s2, b2,
                                          inner_slope=0.2, outer_slope=0.2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert np.any(got < 0)


def test_fold_bn_identity():
    from baryon_painter_tpu.ops.pallas_conv import fold_bn
    s, b = fold_bn(jnp.ones(4), jnp.zeros(4), jnp.zeros(4), jnp.ones(4),
                   eps=0.0)
    np.testing.assert_allclose(np.asarray(s), 1.0)
    np.testing.assert_allclose(np.asarray(b), 0.0)


def test_pallas_gather_raw_kernel(dataset, rng):
    cache = DeviceStackCache(dataset)
    idx = rng.choice(len(dataset), size=4, replace=False)
    digits = jnp.asarray(cache.digits(idx))
    tiles = gather_tiles_pallas(cache.data100, cache.data150, digits,
                                cache.tile_size, interpret=True)
    # raw kernel output: per-depth UNtransformed tiles (B, 2, F, T, T)
    assert tiles.shape == (4, 2, 2, 32, 32)
    summed = np.asarray(dihedral_batch(tiles[:, 0], digits[:, 1])
                        + dihedral_batch(tiles[:, 1], digits[:, 2]))
    host = dataset.get_raw_batch(idx)
    # before SLICS scaling: compare the label field
    np.testing.assert_allclose(summed[:, 1], host["labels"][0], rtol=1e-6)
