"""Trainer tests: fused step, schedules, checkpoint resume, DP sharding."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from baryon_painter_tpu.data.dataset import BahamasTileDataset, load_file_info
from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
from baryon_painter_tpu.models.cvae import CVAE, fiducial_cvae_architecture
from baryon_painter_tpu.train.checkpoint import (load_checkpoint,
                                                 transforms_from_meta)
from baryon_painter_tpu.train.schedules import (fiducial_adaptive_batch_size,
                                                fiducial_adaptive_lr)
from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
from baryon_painter_tpu.transforms import RangeCompress

# quick-tier exclusion: trainer construction + fused-step compiles (run with the full suite)
pytestmark = pytest.mark.slow

TILE = 32


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stacks"))
    info = make_synthetic_stacks(root, n_stack=2, n_grid=64,
                                 redshifts=(0.0, 1.0))
    return BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})


@pytest.fixture(scope="module")
def arch():
    return fiducial_cvae_architecture(tile_size=TILE, n_res_blocks=1)


def make_trainer(dataset, arch, mesh=None, **cfg_kw):
    cfg = TrainConfig(learning_rate=1e-3, batch_size=4, seed=0, **cfg_kw)
    return CVAETrainer(CVAE(arch), dataset, test_data=dataset, config=cfg,
                       mesh=mesh)


@pytest.fixture(scope="module")
def shared_trainer(dataset, arch):
    return make_trainer(dataset, arch)


def test_single_step_updates_params(dataset, arch, shared_trainer):
    tr = shared_trainer
    step0 = int(tr.state.step)
    p0 = jax.tree.map(np.asarray, tr.state.params)
    batch = dataset.get_raw_batch(np.arange(4))
    m = tr.step(batch, lr=1e-3)
    assert np.isfinite(float(m["elbo"]))
    p1 = tr.state.params
    diffs = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()),
                         p1, p0)
    assert max(jax.tree.leaves(diffs)) > 0
    assert int(tr.state.step) == step0 + 1


def test_eval_does_not_mutate(dataset, arch, shared_trainer):
    tr = shared_trainer
    s0 = jax.tree.map(np.asarray, tr.state.params)
    m = tr.eval_loss(dataset.get_raw_batch(np.arange(4)))
    assert np.isfinite(float(m["elbo"]))
    s1 = tr.state.params
    same = jax.tree.map(lambda a, b: np.array_equal(np.asarray(a), b), s1, s0)
    assert all(jax.tree.leaves(same))


def test_elbo_improves(dataset, arch, shared_trainer):
    tr = shared_trainer
    rng = np.random.default_rng(0)
    elbos = []
    for i in range(25):
        idx = dataset.sample_indices(rng, 8)
        m = tr.step(dataset.get_raw_batch(idx), lr=1e-3)
        elbos.append(float(m["elbo"]))
    assert np.mean(elbos[-5:]) > np.mean(elbos[:5])


def test_train_loop_with_schedules_and_stats(dataset, arch, tmp_path):
    out = str(tmp_path / "run")
    tr = make_trainer(
        dataset, arch,
        n_pepoch=2, pepoch_size=16,
        adaptive_batch_size=lambda p: 2 if p == 0 else 4,
        adaptive_learning_rate=lambda p: 0.5 ** p,
        var_anneal_fn=lambda p: min(1.0, 0.5 * p),
        KL_anneal_fn=lambda p: 1.0,
        validation_loss_frequency=8, validation_loss_batch_size=2,
        checkpoint_frequency=1000, statistics_report_frequency=0,
        output_path=out)
    tstats, vstats = tr.train()
    assert tstats.n_batches > 0 and vstats.n_batches > 0
    # stats text format parity: header + numeric rows
    with open(os.path.join(out, "training_stats.txt")) as f:
        lines = f.read().strip().split("\n")
    assert lines[0].startswith("# Batch nr, sample nr, ELBO, KL_term")
    row = lines[1].split()
    # batch, sample, 5 loss terms (predict_var), lr, batch_size
    assert len(row) == 2 + 5 + 2
    float(row[2])  # parses
    # final checkpoint written
    assert os.path.exists(os.path.join(out, "model_state.msgpack"))
    assert os.path.exists(os.path.join(out, "model_meta.json"))


def test_checkpoint_roundtrip_and_resume(dataset, arch, tmp_path, shared_trainer):
    tr = shared_trainer
    batch = dataset.get_raw_batch(np.arange(4))
    tr.step(batch, lr=1e-3)
    saved_step = int(tr.state.step)
    base = str(tmp_path / "ck")
    tr.save(base)

    tr2 = make_trainer(dataset, arch)
    meta = tr2.restore(base)
    assert meta["model_architecture"]["n_x_features"] == 1
    eq = jax.tree.map(lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
                      tr.state.params, tr2.state.params)
    assert all(jax.tree.leaves(eq))
    assert int(tr2.state.step) == saved_step
    # transforms rebuild from declarative meta (no dill)
    transforms, stats = transforms_from_meta(meta)
    assert set(transforms) == {"dm", "pressure"}
    x = jnp.ones((4, 4)) * 2.0
    y = transforms["dm"].forward(x, stats["dm"], 0.5)
    rec = transforms["dm"].inverse(y, stats["dm"], 0.5)
    np.testing.assert_allclose(np.asarray(rec), 2.0, rtol=1e-4)
    # resumed trainer continues training
    m = tr2.step(batch, lr=1e-3)
    assert np.isfinite(float(m["elbo"]))
    assert int(tr2.state.step) == saved_step + 1


def test_data_parallel_matches_single_device(dataset, arch):
    """Same batch, same init: 8-way DP step must equal single-device step
    (global-batch BN + psum'd grads have identical semantics)."""
    devices = np.array(jax.devices()[:8])
    assert devices.size == 8, "conftest should provide 8 CPU devices"
    mesh = Mesh(devices, axis_names=("data",))
    batch = dataset.get_raw_batch(np.arange(8))

    tr_single = make_trainer(dataset, arch)
    m_single = tr_single.step(batch, lr=1e-3)

    tr_dp = make_trainer(dataset, arch, mesh=mesh)
    m_dp = tr_dp.step(batch, lr=1e-3)

    np.testing.assert_allclose(float(m_single["elbo"]), float(m_dp["elbo"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m_single["kl"]), float(m_dp["kl"]),
                               rtol=2e-4, atol=1e-6)
    # Post-adam params: the first-step update is ~sign(g), so elements with
    # g ~ 0 may flip sign under cross-device reduction-order noise (bounded
    # by 2*lr). Require near-equality overall and a tiny flipped fraction.
    a = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(tr_single.state.params)])
    b = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(tr_dp.state.params)])
    assert np.max(np.abs(a - b)) < 2.5e-3  # <= 2*lr + eps
    assert np.mean(np.abs(a - b) > 1e-5) < 0.02


def test_fiducial_schedules():
    assert [fiducial_adaptive_batch_size(p) for p in (0, 7, 8, 16, 31, 32, 100)] \
        == [4, 4, 8, 16, 16, 24, 24]
    assert fiducial_adaptive_lr(0) == 1.0
    assert fiducial_adaptive_lr(63) == 1.0
    assert fiducial_adaptive_lr(64) == 0.5
    assert fiducial_adaptive_lr(96) == 0.25
    assert fiducial_adaptive_lr(10000) == 1e-6


def _read_stats_file(path):
    with open(path) as f:
        lines = f.read().splitlines()
    rows = np.array([[float(v) for v in l.split()] for l in lines[1:]])
    return lines[0], rows


@pytest.mark.parametrize("device_data", [False, True])
def test_resume_matches_uninterrupted_run(dataset, arch, tmp_path,
                                          device_data):
    """Train 4 pepochs straight vs 2 pepochs + restore + 2 more: the full
    (lr, batch_size, alpha_var) schedule sequence, the stats files and the
    final parameters must be identical (true resume, SURVEY §5)."""
    def build(outdir, n_pepoch):
        cfg = TrainConfig(
            learning_rate=1e-3, batch_size=2, seed=7,
            n_pepoch=n_pepoch, pepoch_size=8,
            adaptive_batch_size=lambda p: 2 if p < 2 else 4,
            adaptive_learning_rate=lambda p: 0.5 ** p,
            var_anneal_fn=lambda p: min(1.0, 0.25 * (p + 1)),
            validation_loss_frequency=8, validation_loss_batch_size=2,
            checkpoint_frequency=10 ** 9, statistics_report_frequency=0,
            stats_sync_every=4, output_path=str(outdir))
        return CVAETrainer(CVAE(arch), dataset, test_data=dataset,
                           config=cfg, device_data=device_data)

    dir_a, dir_b = tmp_path / "full", tmp_path / "resumed"
    build(dir_a, n_pepoch=4).train()

    build(dir_b, n_pepoch=2).train()
    tr = build(dir_b, n_pepoch=4)
    tr.restore(str(dir_b / "model"))
    assert tr._progress is not None and tr._progress["i_pepoch"] == 2
    tr.train()

    for fn in ("training_stats.txt", "validation_stats.txt"):
        header_a, rows_a = _read_stats_file(dir_a / fn)
        header_b, rows_b = _read_stats_file(dir_b / fn)
        assert header_a == header_b
        assert rows_a.shape == rows_b.shape, fn
        # lr / batch_size columns = the schedule sequence; loss columns =
        # identical data + rng streams through the restored state
        np.testing.assert_allclose(rows_b, rows_a, rtol=1e-5, atol=1e-7,
                                   err_msg=fn)

    (sa, _), (sb, _) = (load_checkpoint(str(dir_a / "model")),
                        load_checkpoint(str(dir_b / "model")))
    for pa, pb in zip(jax.tree.leaves(sa["params"]),
                      jax.tree.leaves(sb["params"])):
        np.testing.assert_allclose(pb, pa, rtol=1e-6, atol=1e-8)


def test_resume_preserves_stats_history(tmp_path):
    """TrainingStats(resume=True) re-loads the file instead of truncating."""
    from baryon_painter_tpu.train.stats import TrainingStats

    fn = str(tmp_path / "s.txt")
    st = TrainingStats(["a", "b"], 3, dump_to_file_frequency=1,
                       stats_filename=fn)
    for i in range(5):
        st.push_loss((i + 1) * 4, float(i), float(-i))
    st.flush_to_file()

    st2 = TrainingStats(["a", "b"], 3, dump_to_file_frequency=1,
                        stats_filename=fn, resume=True)
    assert st2.n_batches == 5
    assert st2.loss_terms["a"]["all"] == [0.0, 1.0, 2.0, 3.0, 4.0]
    st2.push_loss(24, 5.0, -5.0)
    st2.flush_to_file()
    _, rows = _read_stats_file(fn)
    assert rows.shape == (6, 4)
    assert rows[-1][0] == 5 and rows[-1][1] == 24  # numbering continues

    with pytest.raises(ValueError):
        TrainingStats(["a", "c"], 3, stats_filename=fn, resume=True)


def test_pk_loss_per_z_matches_manual_grouping(dataset, arch):
    """pk_loss_per_z=True averages per-z masked batch-mean spectral errors;
    with a batch drawn from a single z it must equal the pooled loss, and a
    mixed-z batch must equal the mean of the single-z losses computed on the
    same sub-batches through the pooled path."""
    tr_pooled = make_trainer(dataset, arch, pk_loss_weight=1.0)
    tr_perz = make_trainer(dataset, arch, pk_loss_weight=1.0,
                           pk_loss_per_z=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    params = tr_pooled.state.params
    bstats = tr_pooled.state.batch_stats

    def loss(tr, batch):
        return float(tr._pk_loss(params, bstats,
                                 jnp.asarray(batch["input"]),
                                 [jnp.asarray(l) for l in batch["labels"]],
                                 jnp.asarray(batch["z"]), key))

    # single-z batch: per-z == pooled
    b0 = dataset.get_raw_batch(dataset.sample_indices(rng, 4, z=0.0))
    assert loss(tr_perz, b0) == pytest.approx(loss(tr_pooled, b0), rel=1e-5)

    # balanced mixed-z batch: per-z == mean of the per-z pooled losses
    i0 = dataset.sample_indices(rng, 4, z=0.0)
    i1 = dataset.sample_indices(rng, 4, z=1.0)
    bmix = dataset.get_raw_batch(np.concatenate([i0, i1]))
    b1 = dataset.get_raw_batch(i1)
    b0 = dataset.get_raw_batch(i0)
    expect = 0.5 * (loss(tr_pooled, b0) + loss(tr_pooled, b1))
    assert loss(tr_perz, bmix) == pytest.approx(expect, rel=1e-4)
    assert np.isfinite(loss(tr_perz, bmix))


def test_freeze_bn_stats(dataset, arch):
    """freeze_bn_stats pins the running BN statistics while params train.

    The P(k) gate paints through eval-mode BN; momentum-0.9 running-stat
    updates move the gate even at lr -> 0 (measured: a resumed gate-floor
    checkpoint jumped 0.054 -> 0.12 in 100 steps at lr 5e-6). Fine-tunes
    resume with the restored stats frozen."""
    batch = dataset.get_raw_batch(np.arange(4))

    tr = make_trainer(dataset, arch, freeze_bn_stats=True)
    p0 = jax.device_get(tr.state.params)
    s0 = jax.device_get(tr.state.batch_stats)
    for _ in range(2):
        tr.step(batch, lr=1e-3)
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        tr.state.params, p0)))
    frozen = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        tr.state.batch_stats, s0)))
    assert moved > 0 and frozen == 0.0

    tr2 = make_trainer(dataset, arch)  # default: stats update
    s0 = jax.device_get(tr2.state.batch_stats)
    tr2.step(batch, lr=1e-3)
    drift = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        tr2.state.batch_stats, s0)))
    assert drift > 0


def test_clip_grads_by_global_norm():
    """Unit: the helper caps the global L2 norm and preserves direction."""
    from baryon_painter_tpu.train.trainer import clip_grads_by_global_norm
    import optax
    tree = {"a": jnp.full((3,), 3.0), "b": jnp.full((4,), 4.0)}
    norm = float(optax.global_norm(tree))  # sqrt(9*3 + 16*4) ~ 9.54
    clipped = clip_grads_by_global_norm(tree, 1.0)
    assert abs(float(optax.global_norm(clipped)) - 1.0) < 1e-6
    # direction preserved: clipped = tree / norm
    np.testing.assert_allclose(np.asarray(clipped["a"]),
                               np.asarray(tree["a"]) / norm, rtol=1e-6)
    # below the cap: untouched
    untouched = clip_grads_by_global_norm(tree, norm * 10)
    np.testing.assert_array_equal(np.asarray(untouched["b"]),
                                  np.asarray(tree["b"]))


def test_clip_grad_norm_bounds_update(dataset, arch):
    """The wired clip_grad_norm path scales the gradient the optimizer
    sees to exactly the configured global norm. Adam's first-step moments
    from a zero init are mu = (1-b1)*g, so global_norm(mu)/(1-b1) is the
    post-clip gradient norm — a through-the-trainer observable that pins
    the clip SCALE, not just "something changed" (heavy-tail spectral
    spikes motivated TrainConfig.clip_grad_norm)."""
    import optax
    batch = dataset.get_raw_batch(np.arange(4))
    clip = 1e-4

    tr_ref = make_trainer(dataset, arch)
    tr_huge = make_trainer(dataset, arch, clip_grad_norm=1e9)
    tr_tiny = make_trainer(dataset, arch, clip_grad_norm=clip)

    m_ref = tr_ref.step(batch, lr=1e-3)
    tr_huge.step(batch, lr=1e-3)
    m_tiny = tr_tiny.step(batch, lr=1e-3)

    # same seed + same data: a non-binding clip must not change the step
    for a, b in zip(jax.tree.leaves(tr_ref.state.params),
                    jax.tree.leaves(tr_huge.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    b1 = tr_ref.config.adam_b1
    def post_clip_norm(tr):
        adam_state = tr.state.opt_state[0]  # chain(scale_by_adam, scale)
        return float(optax.global_norm(adam_state.mu)) / (1.0 - b1)

    # reported grad_norm is PRE-clip: identical for both trainers, far
    # above the binding threshold
    raw_norm = float(m_ref["grad_norm"])
    np.testing.assert_allclose(float(m_tiny["grad_norm"]), raw_norm,
                               rtol=1e-5)
    assert raw_norm > 100 * clip

    # unclipped trainer: optimizer saw the raw gradient
    np.testing.assert_allclose(post_clip_norm(tr_ref), raw_norm, rtol=1e-4)
    # binding clip: optimizer saw the gradient rescaled to exactly `clip`
    np.testing.assert_allclose(post_clip_norm(tr_tiny), clip, rtol=1e-4)
