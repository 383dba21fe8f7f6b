"""Device stack cache: on-device assembly must equal the host path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.data.dataset import BahamasTileDataset, load_file_info
from baryon_painter_tpu.data.device_cache import DeviceStackCache
from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
from baryon_painter_tpu.models.cvae import CVAE, fiducial_cvae_architecture
from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
from baryon_painter_tpu.transforms import RangeCompress


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stacks"))
    info = make_synthetic_stacks(root, n_stack=3, n_grid=64,
                                 redshifts=(0.0, 0.5, 1.0))
    return BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        tile_permutations=True, n_stack=2, stack_offset=1,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})


def test_gather_matches_host_path(dataset):
    cache = DeviceStackCache(dataset)
    rng = np.random.default_rng(0)
    idx = rng.choice(len(dataset), size=16, replace=False)
    digits = cache.digits(idx)
    inputs, labels, zs = jax.jit(cache.gather)(digits)
    host = dataset.get_raw_batch(idx)
    np.testing.assert_allclose(np.asarray(inputs), host["input"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(labels), host["labels"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(zs), host["z"])


def test_gather_honors_subtract_minimum(tmp_path_factory):
    """subtract_minimum (per-sample input-tile minimum) must apply on the
    device path exactly as on the host path (dataset.get_raw_batch)."""
    root = str(tmp_path_factory.mktemp("stacks_submin"))
    info = make_synthetic_stacks(root, n_stack=2, n_grid=64,
                                 redshifts=(0.0, 1.0))
    ds = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        subtract_minimum=True,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    cache = DeviceStackCache(ds)
    idx = np.random.default_rng(0).choice(len(ds), size=8, replace=False)
    inputs, labels, zs = jax.jit(cache.gather)(cache.digits(idx))
    host = ds.get_raw_batch(idx)
    np.testing.assert_allclose(np.asarray(inputs), host["input"],
                               rtol=1e-6, atol=1e-6)
    assert np.allclose(np.asarray(inputs).min(axis=(1, 2)), 0.0, atol=1e-6)


def test_fits_estimate(dataset):
    nbytes = DeviceStackCache.nbytes(dataset)
    # 2 fields * 3 z * (3+3 stacks) * 64^2 * 4
    assert nbytes == 2 * 3 * 6 * 64 * 64 * 4
    assert DeviceStackCache.fits(dataset)
    assert not DeviceStackCache.fits(dataset, budget_bytes=nbytes - 1)


@pytest.mark.slow
def test_trainer_step_indices_matches_step(dataset):
    arch = fiducial_cvae_architecture(tile_size=32, n_res_blocks=1)
    idx = np.arange(4)
    tr1 = CVAETrainer(CVAE(arch), dataset, config=TrainConfig(seed=0),
                      device_data=True)
    m1 = tr1.step_indices(idx, lr=1e-3)
    tr2 = CVAETrainer(CVAE(arch), dataset, config=TrainConfig(seed=0))
    m2 = tr2.step(dataset.get_raw_batch(idx), lr=1e-3)
    np.testing.assert_allclose(float(m1["elbo"]), float(m2["elbo"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["kl"]), float(m2["kl"]), rtol=1e-4,
                               atol=1e-7)
    with pytest.raises(RuntimeError):
        tr2.step_indices(idx, lr=1e-3)


@pytest.mark.slow
def test_step_scan_matches_sequential(dataset):
    """K fused scan steps must reproduce K sequential steps exactly
    (same rng folding, same data, same schedules)."""
    arch = fiducial_cvae_architecture(tile_size=32, n_res_blocks=1)
    idx_matrix = np.arange(12).reshape(3, 4)

    tr_seq = CVAETrainer(CVAE(arch), dataset, config=TrainConfig(seed=0),
                         device_data=True)
    last = None
    for row in idx_matrix:
        last = tr_seq.step_indices(row, lr=1e-3)

    tr_scan = CVAETrainer(CVAE(arch), dataset, config=TrainConfig(seed=0),
                          device_data=True)
    metrics = tr_scan.step_scan(idx_matrix, lr=1e-3)
    assert metrics["elbo"].shape == (3,)
    np.testing.assert_allclose(float(metrics["elbo"][-1]),
                               float(last["elbo"]), rtol=1e-5)
    # adam's early updates are ~sign(g)*lr: scan-vs-unrolled float noise can
    # flip near-zero gradients, so params agree only to ~2*lr*K...
    a = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(tr_seq.state.params)])
    b = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(tr_scan.state.params)])
    assert np.max(np.abs(a - b)) < 3 * 2.5e-3
    # ...but behaviourally the two states are equivalent: an identical
    # further step yields the same loss
    m_seq = tr_seq.step_indices(np.arange(4), lr=1e-3)
    m_scan = tr_scan.step_indices(np.arange(4), lr=1e-3)
    np.testing.assert_allclose(float(m_seq["elbo"]), float(m_scan["elbo"]),
                               rtol=1e-3)
    with pytest.raises(RuntimeError):
        CVAETrainer(CVAE(arch), dataset,
                    config=TrainConfig(seed=0)).step_scan(idx_matrix, 1e-3)


@pytest.mark.slow
def test_trainer_falls_back_when_cache_does_not_fit(dataset):
    """device_data=True with stacks over the HBM budget must warn and fall
    back to the host batch path instead of OOMing (docstring contract)."""
    import warnings

    from baryon_painter_tpu.models.cvae import (CVAE,
                                                fiducial_cvae_architecture)
    from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig

    arch = fiducial_cvae_architecture(tile_size=dataset.tile_size,
                                      n_res_blocks=1)
    cfg = TrainConfig(seed=0, device_cache_budget_bytes=1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        tr = CVAETrainer(CVAE(arch), dataset, config=cfg, device_data=True)
    assert any("falling back" in str(x.message) for x in w)
    assert tr.device_cache is None
    m = tr.step(dataset.get_raw_batch(np.arange(2)), lr=1e-3)
    assert np.isfinite(float(m["elbo"]))


# ---- mesh-sharded cache (z-sharded stacks, shard-local gather) --------- #

def _mesh8():
    from jax.sharding import Mesh
    devices = np.array(jax.devices()[:8])
    assert devices.size == 8, "conftest should provide 8 CPU devices"
    return Mesh(devices, axis_names=("data",))


def test_slot_assignment_layouts():
    from baryon_painter_tpu.data.device_cache import _slot_assignment
    # 11 z over 8 devices: round-robin, first 3 devices hold 2 z's
    slots, slab = _slot_assignment(11, 8)
    assert slab == 2 and len(slots) == 16
    for d in range(8):
        local = [z for z in slots[d * slab:(d + 1) * slab] if z >= 0]
        assert len(local) >= 1
    assert sorted(z for z in slots if z >= 0) == list(range(11))
    # fewer z than devices: replication, every device has exactly one
    slots, slab = _slot_assignment(3, 8)
    assert slab == 1 and [z for z in slots] == [0, 1, 2, 0, 1, 2, 0, 1]
    # exact division: no padding, no replication
    slots, slab = _slot_assignment(8, 8)
    assert slab == 1 and slots == list(range(8))


def test_mesh_sharded_gather_matches_replicated(dataset):
    """Sharded gather (shard_map, z-local slices) must be bit-equal to the
    single-device cache on the same device-grouped batch."""
    mesh = _mesh8()
    cache_sh = DeviceStackCache(dataset, mesh=mesh)
    cache_1 = DeviceStackCache(dataset)
    rng = np.random.default_rng(1)
    idx = cache_sh.sample_mesh_indices(rng, 16)

    g_sh = jax.jit(cache_sh.gather)(cache_sh.digits(idx))
    g_1 = jax.jit(cache_1.gather)(cache_1.digits(idx))
    for a, b, name in zip(g_sh, g_1, ("input", "labels", "z")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_mesh_sharded_gather_rejects_nonlocal_z(dataset):
    mesh = _mesh8()
    cache_sh = DeviceStackCache(dataset, mesh=mesh)
    rng = np.random.default_rng(2)
    # all rows z=0.0: devices whose slab lacks z index 0 must raise
    idx = dataset.sample_indices(rng, 16, z=0.0)
    with pytest.raises(ValueError, match="not resident"):
        cache_sh.digits(idx)


@pytest.mark.slow
def test_mesh_sharded_trainer_matches_single_device(tmp_path):
    """A fused scan step through the z-sharded cache on the 8-device mesh
    must match the single-device cache step on the same batch.

    Uses 4 redshifts (divides the 8-device mesh) so the z marginal is
    uniform and the skew-compensation weights are inert — with n_z % n_dev
    != 0 the sharded step intentionally applies per-sample importance
    weights and differs per batch (see
    test_mesh_z_weights_restore_uniform_marginal)."""
    root = str(tmp_path / "s4")
    info = make_synthetic_stacks(root, n_stack=2, n_grid=64,
                                 redshifts=(0.0, 0.5, 1.0, 1.5))
    dataset = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        tile_permutations=True,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    arch = fiducial_cvae_architecture(tile_size=32, n_res_blocks=1)
    mesh = _mesh8()

    def build(mesh_arg):
        return CVAETrainer(CVAE(arch), dataset,
                           config=TrainConfig(seed=0), mesh=mesh_arg,
                           device_data=True)

    tr_1 = build(None)
    tr_sh = build(mesh)
    assert tr_sh.device_cache is not None and tr_sh.device_cache.mesh is mesh

    rng = np.random.default_rng(3)
    idx = np.stack([tr_sh._sample_indices(rng, 16) for _ in range(2)])
    m_1 = tr_1.step_scan(idx, lr=1e-3)
    m_sh = tr_sh.step_scan(idx, lr=1e-3)
    np.testing.assert_allclose(np.asarray(m_1["elbo"]),
                               np.asarray(m_sh["elbo"]), rtol=2e-4)
    a = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(tr_1.state.params)])
    b = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(tr_sh.state.params)])
    assert np.max(np.abs(a - b)) < 5e-3  # adam sign-flip noise, 2 steps


@pytest.mark.slow
def test_mesh_budget_uses_per_device_bytes(dataset):
    """A set exceeding one chip's budget but fitting per-shard constructs
    the sharded cache; the same budget without a mesh falls back."""
    per_dev = DeviceStackCache.nbytes(dataset, n_shards=8)
    total = DeviceStackCache.nbytes(dataset)
    assert per_dev < total
    budget = per_dev + 1
    arch = fiducial_cvae_architecture(tile_size=32, n_res_blocks=1)
    with pytest.warns(UserWarning, match="falling back"):
        tr = CVAETrainer(CVAE(arch), dataset,
                         config=TrainConfig(seed=0,
                                            device_cache_budget_bytes=budget),
                         device_data=True)
    assert tr.device_cache is None
    tr_sh = CVAETrainer(CVAE(arch), dataset,
                        config=TrainConfig(seed=0,
                                           device_cache_budget_bytes=budget),
                        mesh=_mesh8(), device_data=True)
    assert tr_sh.device_cache is not None


@pytest.mark.slow
def test_mesh_z_weights_restore_uniform_marginal(tmp_path):
    """ADVICE r2: equal per-device quotas skew the z marginal when
    n_z % n_dev != 0; the per-slot importance weights must satisfy
    p(z) * w_z = 1/n_z exactly (uniform-z expected gradient)."""
    from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
    from baryon_painter_tpu.data.dataset import load_file_info
    from baryon_painter_tpu.transforms import RangeCompress

    root = str(tmp_path / "s3")
    info = make_synthetic_stacks(root, n_stack=2, n_grid=64,
                                 redshifts=(0.0, 0.5, 1.0))
    ds3 = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        tile_permutations=True,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    cache = DeviceStackCache(ds3, mesh=mesh)

    # 3 z over 8 devices: slots [0,1,2,0,1,2,0,1] -> p = (3/8, 3/8, 2/8)
    assert not cache.uniform_z
    n_z = 3
    p = np.zeros(n_z)
    for d in range(cache._n_dev):
        local = {cache._slot_to_z[s]
                 for s in range(d * cache._slab, (d + 1) * cache._slab)
                 if cache._slot_to_z[s] >= 0}
        for zi in local:
            p[zi] += 1.0 / (cache._n_dev * len(local))
    np.testing.assert_allclose(p, [3 / 8, 3 / 8, 2 / 8])
    # w per slot corresponds to w_z = (1/n_z)/p_z; p_z * w_z == 1/n_z
    for s, zi in enumerate(cache._slot_to_z):
        if zi >= 0:
            np.testing.assert_allclose(
                p[zi] * cache.z_slot_weights[s], 1 / n_z, rtol=1e-6)

    # the weighted step runs and produces a finite ELBO
    arch = fiducial_cvae_architecture(tile_size=32, n_res_blocks=1)
    tr = CVAETrainer(CVAE(arch), ds3, config=TrainConfig(seed=0),
                     mesh=mesh, device_data=True)
    rng = np.random.default_rng(0)
    idx = np.stack([tr._sample_indices(rng, 16)])
    m = tr.step_scan(idx, lr=1e-3)
    assert np.isfinite(float(np.asarray(m["elbo"])[-1]))


@pytest.mark.slow
def test_sample_weight_ones_matches_unweighted(dataset):
    """sample_weight=1 must reproduce the unweighted ELBO bit-for-bit."""
    arch = fiducial_cvae_architecture(tile_size=32, n_res_blocks=1)
    model = CVAE(arch)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 1)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((4, 32, 32, 1)).astype(np.float32))
    z = jnp.asarray(np.array([0.0, 0.5, 0.0, 0.5], np.float32))
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, y, z)

    def run(sw):
        out, _ = model.apply(variables, x, y, z, train=True,
                             sample_weight=sw,
                             rngs={"sample": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
        return out

    base = run(None)
    ones = run(jnp.ones(4))
    np.testing.assert_allclose(float(base["elbo"]), float(ones["elbo"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(base["kl"]), float(ones["kl"]),
                               rtol=1e-6)
    # non-trivial weights change the objective
    skew = run(jnp.asarray(np.array([2.0, 0.5, 1.0, 0.5], np.float32)))
    assert abs(float(skew["elbo"]) - float(base["elbo"])) > 1e-3
