"""Fused-inference checkpoint conversion (models/fuse.py): the renamed
pytree + fused architecture must compute the identical eval function."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.models.cvae import CVAE, fiducial_cvae_architecture
from baryon_painter_tpu.models.fuse import fuse_cvae_variables

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TILE = 64


def _init_model(tile=TILE, n_res_blocks=2):
    arch = fiducial_cvae_architecture(tile_size=tile,
                                      n_res_blocks=n_res_blocks)
    model = CVAE(arch)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, tile, tile, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, tile, tile, 1)), jnp.float32)
    aux = jnp.asarray([0.0, 1.0])
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)},
                           x, y, aux, train=False)
    # nontrivial running stats so the folded-BN path is actually exercised
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape),
                                  jnp.float32),
            variables.get("batch_stats", {}))}
    return arch, model, variables, y, aux


def test_fused_conversion_preserves_decode():
    arch, model, variables, y, aux = _init_model()
    fused_vars, fused_arch = fuse_cvae_variables(variables, arch)
    assert fused_arch["fused_res_blocks"] is True
    fused_model = CVAE(fused_arch)

    hz = TILE // 32
    z = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, hz, hz, 1)), jnp.float32)
    ref = model.apply(variables, z, y, aux, train=False, method=CVAE.P)
    out = fused_model.apply(fused_vars, z, y, aux, train=False,
                            method=CVAE.P)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fused_conversion_preserves_q_heads():
    arch, model, variables, y, aux = _init_model()
    fused_vars, fused_arch = fuse_cvae_variables(variables, arch)
    fused_model = CVAE(fused_arch)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (2, TILE, TILE, 1)), jnp.float32)
    mu1, lv1 = model.apply(variables, x, y, aux, train=False, method=CVAE.Q)
    mu2, lv2 = fused_model.apply(fused_vars, x, y, aux, train=False,
                                 method=CVAE.Q)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv1), np.asarray(lv2),
                               rtol=1e-5, atol=1e-5)


def test_fused_param_structure():
    arch, model, variables, y, aux = _init_model(n_res_blocks=3)
    fused_vars, _ = fuse_cvae_variables(variables, arch)
    p = fused_vars["params"]["p_y_z_in"]
    for i in range(3):
        assert f"FusedResBlock_{i}" in p
        assert f"ResidualBlock_{i}" not in p
        assert set(p[f"FusedResBlock_{i}"]) == {
            "conv1_kernel", "conv2_kernel", "bn1_scale", "bn1_bias",
            "bn2_scale", "bn2_bias"}
    s = fused_vars["batch_stats"]["p_y_z_in"]
    assert set(s["FusedResBlock_0"]) == {"bn1_mean", "bn1_var",
                                         "bn2_mean", "bn2_var"}


def test_fused_cgan_generator_preserves_output():
    """SN folding (flax's exact eval sigma) + fused leaky res blocks must
    reproduce the spectral-norm generator's eval output."""
    from baryon_painter_tpu.models.cgan import CGANGenerator
    from baryon_painter_tpu.models.fuse import fuse_cgan_generator_variables

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((2, 32, 32, 1)), jnp.float32)
    z = jnp.asarray([0.0, 1.5])
    arch = {"in_channels": 2, "n_res_blocks": 2, "upsample": "transpose"}
    gen = CGANGenerator(**arch)
    variables = gen.init(jax.random.PRNGKey(0), y, z, train=True)
    # a couple of update steps so u vectors and BN stats are nontrivial
    for _ in range(3):
        _, upd = gen.apply(variables, y, z, train=True,
                           mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": upd["batch_stats"]}
    ref = gen.apply(variables, y, z, train=False)

    fused_vars, kwargs = fuse_cgan_generator_variables(variables, arch)
    assert kwargs["spectral_norm"] is False
    assert kwargs["fused_res_blocks"] is True
    fused = CGANGenerator(**kwargs)
    out = fused.apply(fused_vars, y, z, train=False)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-5, atol=2e-5)
    # converted blocks actually use the fused layout
    assert "FusedResBlock_0" in fused_vars["params"]["SpecSequential_0"]


def test_fused_cgan_painter_save_reload_roundtrip(tmp_path):
    """A fused-converted CGANPainter's checkpoint must reload and paint:
    the converted layout (no SN state, FusedResBlock params) has to be
    recorded in the saved architecture."""
    from baryon_painter_tpu.data.dataset import (BahamasTileDataset,
                                                 load_file_info)
    from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
    from baryon_painter_tpu.models.cgan import (CGANDiscriminator,
                                                CGANGenerator)
    from baryon_painter_tpu.painter import CGANPainter
    from baryon_painter_tpu.train.cgan import CGANTrainConfig, CGANTrainer
    from baryon_painter_tpu.transforms import RangeCompress

    root = str(tmp_path / "stacks")
    info = make_synthetic_stacks(root, n_stack=2, n_grid=64,
                                 redshifts=(0.0, 1.0))
    ds = BahamasTileDataset(
        files=load_file_info(info), root_path=root, n_tile=2,
        transforms={"dm": RangeCompress("shift-log", 4.0),
                    "pressure": RangeCompress("shift-log", 4.0)})
    trainer = CGANTrainer(ds, generator=CGANGenerator(n_res_blocks=1),
                          discriminator=CGANDiscriminator(),
                          config=CGANTrainConfig(seed=0, batch_size=2))
    plain = CGANPainter.from_trainer(trainer)
    fused = CGANPainter(generator=trainer.generator,
                        variables=plain.variables, meta=plain.meta,
                        fused_inference=True)
    assert fused.meta["model_architecture"]["fused_res_blocks"] is True
    base = str(tmp_path / "fused_ckpt")
    fused.save_state_to_file(base)

    reloaded = CGANPainter(base)
    assert reloaded.generator.fused_res_blocks
    assert not reloaded.generator.spectral_norm
    tile = np.abs(np.random.default_rng(0).standard_normal(
        (32, 32))).astype(np.float32)
    a = np.asarray(fused.paint(tile, z=0.5))
    b = np.asarray(reloaded.paint(tile, z=0.5))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    # fused_inference also applies to an SN-free generator (rename only,
    # no SN state to fold) instead of being silently ignored
    gen_nosn = CGANGenerator(n_res_blocks=1, spectral_norm=False)
    import jax
    import jax.numpy as jnp
    v = gen_nosn.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 32, 32, 1)), jnp.zeros((1,)),
                      train=False)
    v = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}
    p_plain = CGANPainter(generator=gen_nosn, variables=v, meta=plain.meta)
    p_fused = CGANPainter(generator=gen_nosn, variables=v, meta=plain.meta,
                          fused_inference=True)
    assert p_fused.generator.fused_res_blocks
    a = np.asarray(p_plain.paint(tile, z=0.5))
    b = np.asarray(p_fused.paint(tile, z=0.5))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_cgan_painter_matches_on_committed_checkpoint():
    from baryon_painter_tpu.painter import CGANPainter
    base = os.path.join(REPO, "trained_models", "CGAN", "fiducial", "model")
    if not os.path.exists(base + "_state.msgpack"):
        pytest.skip("no committed CGAN checkpoint")
    plain = CGANPainter(base)
    fused = CGANPainter(base, fused_inference=True)
    assert fused.generator.fused_res_blocks

    tile = np.abs(np.random.default_rng(0).standard_normal(
        (plain.tile_size, plain.tile_size))).astype(np.float32)
    a = plain.paint_batch(tile[None], np.zeros(1, np.float32))
    b = fused.paint_batch(tile[None], np.zeros(1, np.float32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fused_painter_matches_on_committed_flagship():
    """End-to-end: the committed fiducial checkpoint painted fused vs
    unfused gives identical tiles (CVAEPainter fused_inference=True)."""
    from baryon_painter_tpu.painter import CVAEPainter
    base = os.path.join(REPO, "trained_models", "archive",
                        "CVAE-fiducial-transpose-256", "model")
    if not os.path.exists(base + "_state.msgpack"):
        pytest.skip("no committed flagship checkpoint")
    plain = CVAEPainter(base)
    fused = CVAEPainter(base, fused_inference=True)
    assert fused.architecture["fused_res_blocks"] is True

    tile = np.abs(np.random.default_rng(0).standard_normal(
        (plain.tile_size, plain.tile_size))).astype(np.float32)
    rng = jax.random.PRNGKey(42)
    a = plain.paint_batch(tile[None], np.zeros(1, np.float32), rng=rng)
    b = fused.paint_batch(tile[None], np.zeros(1, np.float32), rng=rng)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)
