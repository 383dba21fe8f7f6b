"""CGAN tests: architecture shapes, spectral norm, adversarial step, painter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.data.dataset import BahamasTileDataset, load_file_info
from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
from baryon_painter_tpu.models.cgan import (CGANDiscriminator, CGANGenerator,
                                            z_feature)
from baryon_painter_tpu.painter import CGANPainter, load_painter
from baryon_painter_tpu.train.cgan import CGANTrainConfig, CGANTrainer
from baryon_painter_tpu.transforms import RangeCompress

# quick-tier exclusion: G/D training-step compiles (run with the full suite)
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
def trainer(dataset):
    return CGANTrainer(dataset,
                       generator=CGANGenerator(n_res_blocks=1),
                       discriminator=CGANDiscriminator(),
                       config=CGANTrainConfig(seed=0, batch_size=2))


def test_z_feature():
    np.testing.assert_allclose(np.asarray(z_feature(jnp.array([0.0, 2.0]))),
                               [-1.0, 1.0])


def test_generator_shapes():
    g = CGANGenerator(n_res_blocks=1)
    y = jnp.zeros((2, TILE, TILE, 1))
    z = jnp.zeros((2,))
    out, variables = g.init_with_output(jax.random.PRNGKey(0), y, z,
                                        train=False)
    assert out.shape == (2, TILE, TILE, 1)
    # tanh output range
    assert np.all(np.abs(np.asarray(out)) <= 1.0)
    # spectral norm state exists
    flat = jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0]
    assert any("u" in "/".join(str(k) for k in path) or "sigma" in
               "/".join(str(k) for k in path) for path, _ in flat)


def test_discriminator_shapes():
    d = CGANDiscriminator()
    y = jnp.zeros((2, TILE, TILE, 1))
    x = jnp.zeros((2, TILE, TILE, 1))
    z = jnp.zeros((2,))
    out, _ = d.init_with_output(jax.random.PRNGKey(0), y, z, x, train=False)
    assert out.ndim == 4 and out.shape[0] == 2 and out.shape[-1] == 1
    p = np.asarray(out)
    assert np.all((p >= 0) & (p <= 1))  # sigmoid probabilities


def test_gan_step_updates_both_nets(dataset, trainer):
    tr = trainer
    g0 = jax.tree.map(np.asarray, tr.state.g_params)
    d0 = jax.tree.map(np.asarray, tr.state.d_params)
    m = tr.step(dataset.get_raw_batch(np.arange(2)), lr=5e-5)
    for key in ("loss_D", "loss_G_adv", "loss_G_perceptual"):
        assert np.isfinite(float(m[key])), key
    assert 0 <= float(m["D_real"]) <= 1 and 0 <= float(m["D_fake"]) <= 1
    gd = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        tr.state.g_params, g0)))
    dd = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        tr.state.d_params, d0)))
    assert gd > 0 and dd > 0


def test_gan_calibration_mode_freezes_discriminator(dataset):
    """adversarial_weight=0: G still trains (perceptual+spectral), D is
    bit-frozen — the spectral-calibration fine-tune mode."""
    tr = CGANTrainer(dataset, generator=CGANGenerator(n_res_blocks=1),
                     discriminator=CGANDiscriminator(),
                     config=CGANTrainConfig(seed=0, batch_size=2,
                                            pk_loss_weight=1.0,
                                            adversarial_weight=0.0))
    g0 = jax.tree.map(np.asarray, tr.state.g_params)
    d0 = jax.tree.map(np.asarray, tr.state.d_params)
    s0 = jax.tree.map(np.asarray, tr.state.g_stats)
    m = tr.step(dataset.get_raw_batch(np.arange(2)), lr=5e-5)
    assert float(m["loss_G_adv"]) == 0.0 and float(m["loss_D"]) == 0.0
    assert np.isfinite(float(m["loss_G_perceptual"]))
    assert np.isfinite(float(m["pk_loss"])) and float(m["pk_loss"]) > 0
    gd = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        tr.state.g_params, g0)))
    dd = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        tr.state.d_params, d0)))
    assert gd > 0 and dd == 0.0
    # BN running stats must NOT drift in calibration mode: every loss term
    # flows through the eval-mode paint path, so the painted network is
    # exactly the optimized one (the round-3 0.13 -> 1.0 divergence)
    sd = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        tr.state.g_stats, s0))) if jax.tree.leaves(tr.state.g_stats) else 0.0
    assert sd == 0.0


def test_gan_checkpoint_and_painter(dataset, trainer, tmp_path):
    tr = trainer
    tr.step(dataset.get_raw_batch(np.arange(2)), lr=5e-5)
    base = str(tmp_path / "gan")
    tr.save(base)

    p = CGANPainter(base)
    tile = dataset.get_input_sample(3, transform=False)
    out = p.paint(tile, z=1.0)
    assert out.shape == (TILE, TILE)
    assert np.all(np.isfinite(out))
    # painting is deterministic for the CGAN (no latent sampling)
    out2 = p.paint(tile, z=1.0)
    np.testing.assert_allclose(out, out2)
    # dispatcher picks the right painter class
    p2 = load_painter(base)
    assert isinstance(p2, CGANPainter)
    # resume path
    tr2 = CGANTrainer(dataset, generator=CGANGenerator(n_res_blocks=1),
                      discriminator=CGANDiscriminator(),
                      config=CGANTrainConfig(seed=1, batch_size=2))
    meta = tr2.restore(base)
    assert meta["model_kind"] == "cgan"
    eq = jax.tree.map(lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
                      tr.state.g_params, tr2.state.g_params)
    assert all(jax.tree.leaves(eq))


def test_gan_device_data_matches_host(dataset):
    tr_host = CGANTrainer(dataset, generator=CGANGenerator(n_res_blocks=1),
                          discriminator=CGANDiscriminator(),
                          config=CGANTrainConfig(seed=3, batch_size=2))
    tr_dev = CGANTrainer(dataset, generator=CGANGenerator(n_res_blocks=1),
                         discriminator=CGANDiscriminator(),
                         config=CGANTrainConfig(seed=3, batch_size=2),
                         device_data=True)
    idx = np.arange(2)
    m_h = tr_host.step(dataset.get_raw_batch(idx), lr=5e-5)
    m_d = tr_dev.step_indices(idx, lr=5e-5)
    np.testing.assert_allclose(float(m_h["loss_D"]), float(m_d["loss_D"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m_h["loss_G_adv"]),
                               float(m_d["loss_G_adv"]), rtol=1e-4)
    with pytest.raises(RuntimeError):
        tr_host.step_indices(idx, lr=5e-5)


def test_gan_from_trainer_painter(dataset, trainer):
    p = CGANPainter.from_trainer(trainer)
    tiles = np.stack([dataset.get_input_sample(i, transform=False)
                      for i in range(2)])
    out = np.asarray(p.paint_batch(tiles, np.array([0.0, 1.0], np.float32)))
    assert out.shape == (2, TILE, TILE)


def test_gan_from_trainer_dtype_override(dataset, trainer):
    """from_trainer(dtype=...) paints the live generator state in a chosen
    compute dtype (the dual-dtype fidelity gate; see CVAE counterpart)."""
    import jax.numpy as jnp
    p_keep = CGANPainter.from_trainer(trainer)
    p_f32 = CGANPainter.from_trainer(trainer, dtype=None)
    p_bf16 = CGANPainter.from_trainer(trainer, dtype=jnp.bfloat16)
    assert p_keep.generator is trainer.generator
    assert p_f32.generator.dtype is None
    assert p_bf16.generator.dtype == jnp.bfloat16
    # the rebuilt generator must preserve every architecture knob
    for attr in ("in_channels", "n_res_blocks", "spectral_norm", "upsample",
                 "fused_res_blocks"):
        assert getattr(p_f32.generator, attr) == getattr(
            trainer.generator, attr)
    tile = dataset.get_input_sample(0, transform=False)
    outs = [np.asarray(p.paint_batch(tile[None], np.zeros(1, np.float32)))
            for p in (p_f32, p_bf16)]
    for o in outs:
        assert np.all(np.isfinite(o))
    np.testing.assert_allclose(outs[0], outs[1], rtol=0.15, atol=0.15)


def test_gan_step_scan_matches_sequential(dataset):
    """K scan-fused G/D steps == K sequential step_indices calls."""
    def make():
        return CGANTrainer(dataset, generator=CGANGenerator(n_res_blocks=1),
                           discriminator=CGANDiscriminator(),
                           config=CGANTrainConfig(seed=5, batch_size=2),
                           device_data=True)

    idx = np.stack([np.array([0, 1]), np.array([2, 3]), np.array([4, 5]),
                    np.array([6, 7])])
    tr_seq = make()
    seq = [tr_seq.step_indices(row, lr=5e-5) for row in idx]
    tr_scan = make()
    fused = tr_scan.step_scan(idx, lr=5e-5)
    for k in ("loss_D", "loss_G_adv", "loss_G_perceptual"):
        np.testing.assert_allclose(
            np.asarray(fused[k]), [float(m[k]) for m in seq],
            rtol=5e-4, atol=1e-6, err_msg=k)
    # params: scan vs per-step compilation reassociates float reductions and
    # adversarial adam dynamics flip update signs on a handful of elements;
    # bound the disagreement by ~the K adam steps taken (K * lr = 2e-4).
    # The strict equivalence check is the loss trajectory above.
    for a, b in zip(jax.tree.leaves(tr_seq.state.g_params),
                    jax.tree.leaves(tr_scan.state.g_params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=len(idx) * 5e-5 + 1e-5)


def test_gan_train_loop_scan_and_validate(dataset, tmp_path):
    """train() through the scan path writes stats + checkpoints; validate()
    produces sample/P(k)/histogram figures (reference painter.py:295-367)."""
    import matplotlib
    matplotlib.use("Agg")

    cfg = CGANTrainConfig(seed=0, batch_size=2, n_pepoch=2, pepoch_size=8,
                          stats_sync_every=4, checkpoint_frequency=10 ** 9,
                          output_path=str(tmp_path / "out"))
    tr = CGANTrainer(dataset, test_data=dataset,
                     generator=CGANGenerator(n_res_blocks=1),
                     discriminator=CGANDiscriminator(),
                     config=cfg, device_data=True)
    stats, _val_stats = tr.train()
    assert stats.n_batches == 8
    assert (tmp_path / "out" / "training_stats.txt").exists()
    assert (tmp_path / "out" / "model_state.msgpack").exists()

    figs = tr.validate(validation_batch_size=2, seed=1)
    assert {"sample", "auto_power_spectrum", "log_histogram"} <= set(figs)


def test_gan_spectral_loss_trains_and_reports(dataset):
    """pk_loss_weight>0 adds a finite per-z spectral term to the generator
    loss (train/spectral.py) and still updates both nets."""
    tr = CGANTrainer(dataset, generator=CGANGenerator(n_res_blocks=1),
                     discriminator=CGANDiscriminator(),
                     config=CGANTrainConfig(seed=0, batch_size=4,
                                            pk_loss_weight=1.0,
                                            pk_loss_per_z=True))
    rng = np.random.default_rng(0)
    idx = np.concatenate([dataset.sample_indices(rng, 2, z=0.0),
                          dataset.sample_indices(rng, 2, z=1.0)])
    g0 = jax.tree.map(np.asarray, tr.state.g_params)
    m = tr.step(dataset.get_raw_batch(idx), lr=1e-4)
    pk = float(m["pk_loss"])
    assert np.isfinite(pk) and pk > 0
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        tr.state.g_params, g0))
    assert max(changed) > 0


def test_gan_data_parallel_matches_single_device(dataset):
    """Same batch, same init: 8-way DP G/D step must equal the single-device
    step (CVAE-side counterpart: test_trainer.test_data_parallel_matches_
    single_device; VERDICT r2 item 6)."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8])
    assert devices.size == 8, "conftest should provide 8 CPU devices"
    mesh = Mesh(devices, axis_names=("data",))
    batch = dataset.get_raw_batch(np.arange(8))

    def make(mesh=None):
        return CGANTrainer(dataset, generator=CGANGenerator(n_res_blocks=1),
                           discriminator=CGANDiscriminator(),
                           config=CGANTrainConfig(seed=3, batch_size=8),
                           mesh=mesh)

    tr_single = make()
    m_s = tr_single.step(batch, lr=5e-5)
    tr_dp = make(mesh=mesh)
    m_dp = tr_dp.step(batch, lr=5e-5)

    for k in ("loss_D", "loss_G_adv", "loss_G_perceptual", "D_real",
              "D_fake"):
        np.testing.assert_allclose(float(m_s[k]), float(m_dp[k]), rtol=2e-4,
                                   atol=1e-6, err_msg=k)
    # post-adam params: first-step updates are ~sign(g)*lr; allow the tiny
    # reduction-order flip fraction the CVAE-side test allows
    for net in ("g_params", "d_params"):
        a = np.concatenate([np.asarray(x).ravel() for x in
                            jax.tree.leaves(getattr(tr_single.state, net))])
        b = np.concatenate([np.asarray(x).ravel() for x in
                            jax.tree.leaves(getattr(tr_dp.state, net))])
        assert np.max(np.abs(a - b)) < 2.5 * 5e-5, net
        assert np.mean(np.abs(a - b) > 1e-6) < 0.02, net


def test_gan_sharded_device_cache_step(dataset):
    """Mesh + device_data: the z-sharded HBM cache wiring (ADVICE r2) feeds
    the fused G/D scan step with device-grouped z-local batches."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:2])
    mesh = Mesh(devices, axis_names=("data",))
    tr = CGANTrainer(dataset, generator=CGANGenerator(n_res_blocks=1),
                     discriminator=CGANDiscriminator(),
                     config=CGANTrainConfig(seed=4, batch_size=4),
                     mesh=mesh, device_data=True)
    assert tr.device_cache is not None and tr.device_cache.mesh is mesh
    rng = np.random.default_rng(0)
    idx = np.stack([tr._sample_indices(rng, 4) for _ in range(2)])
    m = tr.step_scan(idx, lr=5e-5)
    assert np.isfinite(np.asarray(m["loss_D"])).all()
    assert np.isfinite(np.asarray(m["loss_G_adv"])).all()


def test_gan_device_cache_budget_falls_back_to_host(dataset, recwarn):
    """A too-small device budget must warn and fall back to the host batch
    path instead of allocating the cache (ADVICE r2: fits() gating)."""
    tr = CGANTrainer(dataset, generator=CGANGenerator(n_res_blocks=1),
                     discriminator=CGANDiscriminator(),
                     config=CGANTrainConfig(seed=0, batch_size=2,
                                            device_cache_budget_bytes=1),
                     device_data=True)
    assert tr.device_cache is None
    assert any("falling back to the host batch path" in str(w.message)
               for w in recwarn.list)
    # host path still trains
    m = tr.step(dataset.get_raw_batch(np.arange(2)), lr=5e-5)
    assert np.isfinite(float(m["loss_D"]))


def test_gan_resume_matches_uninterrupted_run(dataset, tmp_path):
    """Train 4 pepochs straight vs 2 + restore + 2 more: schedule sequence,
    stats files and final G/D parameters must match (CVAE-side counterpart:
    test_resume_matches_uninterrupted_run; VERDICT r2 item 6)."""
    from baryon_painter_tpu.train.checkpoint import load_checkpoint

    def build(outdir, n_pepoch):
        cfg = CGANTrainConfig(
            seed=7, batch_size=2, n_pepoch=n_pepoch, pepoch_size=8,
            stats_sync_every=4, checkpoint_frequency=10 ** 9,
            validation_loss_frequency=8, validation_loss_batch_size=2,
            statistics_report_frequency=0, output_path=str(outdir))
        return CGANTrainer(dataset, test_data=dataset,
                           generator=CGANGenerator(n_res_blocks=1),
                           discriminator=CGANDiscriminator(),
                           config=cfg, device_data=True)

    def read_stats(path):
        with open(path) as f:
            lines = f.read().splitlines()
        rows = np.array([[float(v) for v in l.split()] for l in lines[1:]])
        return lines[0], rows

    dir_a, dir_b = tmp_path / "full", tmp_path / "resumed"
    build(dir_a, n_pepoch=4).train()

    build(dir_b, n_pepoch=2).train()
    tr = build(dir_b, n_pepoch=4)
    tr.restore(str(dir_b / "model"))
    assert tr._progress is not None and tr._progress["i_pepoch"] == 2
    tr.train()

    for fn in ("training_stats.txt", "validation_stats.txt"):
        header_a, rows_a = read_stats(dir_a / fn)
        header_b, rows_b = read_stats(dir_b / fn)
        assert header_a == header_b
        assert rows_a.shape == rows_b.shape, fn
        np.testing.assert_allclose(rows_b, rows_a, rtol=1e-5, atol=1e-7,
                                   err_msg=fn)

    (sa, _), (sb, _) = (load_checkpoint(str(dir_a / "model")),
                        load_checkpoint(str(dir_b / "model")))
    for net in ("g_params", "d_params"):
        for pa, pb in zip(jax.tree.leaves(sa[net]),
                          jax.tree.leaves(sb[net])):
            np.testing.assert_allclose(pb, pa, rtol=1e-6, atol=1e-8)


def test_resize_generator_shapes_and_roundtrip(dataset, tmp_path):
    """The resize-upsample generator variant (checkerboard-free, the same
    trick as the CVAE's fiducial-resize decoder) must produce same-shape
    output and survive a checkpoint round trip with its mode recorded."""
    tr = CGANTrainer(dataset,
                     generator=CGANGenerator(n_res_blocks=1,
                                             upsample="resize"),
                     discriminator=CGANDiscriminator(),
                     config=CGANTrainConfig(seed=0, batch_size=2))
    m = tr.step(dataset.get_raw_batch(np.arange(2)), lr=5e-5)
    assert all(np.isfinite(v) for v in jax.tree.leaves(m))
    base = str(tmp_path / "gan_resize")
    tr.save(base)
    p = load_painter(base)
    assert isinstance(p, CGANPainter)
    assert p.generator.upsample == "resize"
    out = p.paint(dataset.get_input_sample(0, transform=False), z=0.5)
    assert out.shape == (TILE, TILE)
    assert np.all(np.isfinite(out))


def test_sample_weight_ones_matches_unweighted(dataset, trainer):
    """sample_weight=1 must reproduce the unweighted G/D step exactly
    (mirrors the CVAE's ELBO importance-weight identity); skewed weights
    must change the losses."""
    batch = dataset.get_raw_batch(np.arange(4))
    args = (jnp.asarray(batch["input"]), jnp.asarray(batch["labels"][0]),
            jnp.asarray(batch["z"]), jax.random.PRNGKey(3), 5e-5)

    def run(sw):
        _, metrics = trainer._train_step_impl(trainer.state, *args,
                                              sample_weight=sw)
        return jax.device_get(metrics)

    base = run(None)
    ones = run(jnp.ones(4))
    for k in ("loss_D", "loss_G_adv", "loss_G_perceptual"):
        np.testing.assert_allclose(float(ones[k]), float(base[k]),
                                   rtol=1e-6, err_msg=k)
    # Non-trivial weights change the objective. At init the D outputs are
    # near-constant across samples, so probe the perceptual term (real
    # per-sample spread) with a loose threshold on the adversarial terms.
    skew = run(jnp.asarray([2.0, 0.5, 1.0, 0.5], jnp.float32))
    assert (abs(float(skew["loss_G_perceptual"])
                - float(base["loss_G_perceptual"])) > 1e-4)
    assert abs(float(skew["loss_D"]) - float(base["loss_D"])) > 1e-6


def test_mesh_sharded_cgan_applies_z_weights(tmp_path):
    """With n_z % n_dev != 0 the mesh CGAN step must route the cache's
    importance weights into the G/D losses (the CVAE got this in round 2;
    the CGAN previously trained on the skewed z marginal unweighted)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh
    root = str(tmp_path / "s3")
    info = make_synthetic_stacks(root, n_stack=2, n_grid=64,
                                 redshifts=(0.0, 0.5, 1.0))
    ds3 = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    tr = CGANTrainer(ds3, generator=CGANGenerator(n_res_blocks=1),
                     discriminator=CGANDiscriminator(),
                     config=CGANTrainConfig(seed=0, batch_size=16),
                     mesh=mesh, device_data=True)
    assert tr.device_cache is not None and not tr.device_cache.uniform_z
    rng = np.random.default_rng(0)
    idx = np.stack([tr._sample_indices(rng, 16)])
    m = tr.step_scan(idx, lr=5e-5)
    assert np.isfinite(float(np.asarray(m["loss_D"])[-1]))
    assert np.isfinite(float(np.asarray(m["loss_G_adv"])[-1]))


def test_cgan_paints_through_lightcone_pipeline(trainer):
    """The fully-convolutional generator must paint SLICS tiles at a
    resolution different from its training tiles through the production
    pipeline (create_lightcone.py --model cgan paints 512^2 tiles with the
    256^2-trained checkpoint; here 48 vs the fixture's 32)."""
    from baryon_painter_tpu.lightcone.pipeline import paint_plane
    p = CGANPainter.from_trainer(trainer)
    rng = np.random.default_rng(3)
    n_tile = 48
    plane_px = 53  # forces >1 overlapping tile and a non-integer zoom
    plane = jnp.asarray(
        rng.gamma(2.0, 0.5, size=(plane_px, plane_px)).astype(np.float32))
    out = np.asarray(paint_plane(
        p, plane, z_slice=0.5, tile_size=100.0,
        delta_size=plane_px / n_tile * 100.0, n_pixel_tile=n_tile,
        min_tile_overlap=0.2, paint_batch_size=2))
    assert out.shape == (plane_px, plane_px)
    assert np.all(np.isfinite(out))
    assert out.std() > 0  # painted structure, not a constant fill


def test_freeze_bn_stats_adv_on(dataset):
    """freeze_bn_stats pins G running stats in adversarial mode (the gate
    paints through eval-mode BN; see TrainConfig.freeze_bn_stats)."""
    tr = CGANTrainer(dataset, generator=CGANGenerator(n_res_blocks=1),
                     discriminator=CGANDiscriminator(),
                     config=CGANTrainConfig(seed=0, batch_size=2,
                                            freeze_bn_stats=True))
    batch = dataset.get_raw_batch(np.arange(2))
    g0 = jax.device_get(tr.state.g_params)
    s0 = jax.device_get(tr.state.g_stats)
    tr.step(batch, lr=5e-5)
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        tr.state.g_params, g0)))
    frozen = (max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        tr.state.g_stats, s0))) if jax.tree.leaves(tr.state.g_stats) else 0.0)
    assert moved > 0 and frozen == 0.0


def test_reinit_discriminator(dataset):
    """The fresh-D recipe replaces D params/stats/opt and keeps G intact."""
    import jax

    tr = CGANTrainer(dataset, generator=CGANGenerator(n_res_blocks=1),
                     discriminator=CGANDiscriminator(),
                     config=CGANTrainConfig(seed=0, batch_size=2))
    g_before = jax.tree.map(np.asarray, tr.state.g_params)
    d_before = jax.tree.map(np.asarray, tr.state.d_params)
    tr.reinit_discriminator(seed=123)
    for a, b in zip(jax.tree.leaves(g_before),
                    jax.tree.leaves(tr.state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(d_before),
                        jax.tree.leaves(tr.state.d_params)))
    assert changed, "discriminator parameters did not change"
    # optimizer moments reset to zeros
    mom = [x for x in jax.tree.leaves(tr.state.d_opt)
           if hasattr(x, "shape") and getattr(x, "size", 0) > 1]
    assert mom and all(float(np.abs(np.asarray(m)).max()) == 0.0
                       for m in mom)
    # the trainer still steps after the swap
    m = tr.step(dataset.get_raw_batch(np.arange(2)), lr=5e-5)
    assert np.isfinite(float(m["loss_D"]))
    assert np.isfinite(float(m["loss_G_adv"]))


def test_feature_matching_adversarial_term(dataset):
    """feature_matching swaps G's adv term for batch-mean D-feature
    matching: finite, differs from BCE, and still steps the trainer."""
    import jax

    tr = CGANTrainer(dataset, generator=CGANGenerator(n_res_blocks=1),
                     discriminator=CGANDiscriminator(),
                     config=CGANTrainConfig(seed=0, batch_size=2,
                                            feature_matching=True))
    m = tr.step(dataset.get_raw_batch(np.arange(2)), lr=5e-5)
    fm_adv = float(m["loss_G_adv"])
    assert np.isfinite(fm_adv) and fm_adv >= 0  # squared distance
    assert np.isfinite(float(m["loss_D"]))  # D still trains with BCE

    tr_bce = CGANTrainer(dataset, generator=CGANGenerator(n_res_blocks=1),
                         discriminator=CGANDiscriminator(),
                         config=CGANTrainConfig(seed=0, batch_size=2))
    m_bce = tr_bce.step(dataset.get_raw_batch(np.arange(2)), lr=5e-5)
    assert fm_adv != float(m_bce["loss_G_adv"])
