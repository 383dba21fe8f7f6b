"""FusedResBlock: train-mode BN semantics + eval fused path + CVAE flag."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.models.cvae import CVAE, fiducial_cvae_architecture
from baryon_painter_tpu.models.layers import (FusedResBlock,
                                              _is_canonical_res_block)
from baryon_painter_tpu.models import dsl

# quick-tier exclusion: fused res-block train/eval compiles (run with the full suite)
pytestmark = pytest.mark.slow


def test_canonical_detection():
    from baryon_painter_tpu.models.layers import _canonical_res_block_slopes
    assert _is_canonical_res_block(dsl.res_block(128))
    assert _canonical_res_block_slopes(dsl.res_block(128)) == (0.0, 0.0)
    # leaky outer activations are canonical too (CGAN generator blocks)
    leaky = dsl.res_block(64, activation="Leaky ReLU")
    assert _canonical_res_block_slopes(leaky) == (0.0, 0.2)
    assert not _is_canonical_res_block(dsl.res_block(64, activation="tanh"))
    inner, act = dsl.res_block(32)
    inner[0][1]["kernel_size"] = 5
    assert not _is_canonical_res_block((inner, act))


def manual_res_block(x, params, stats, train, eps=1e-5):
    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def bn(h, scale, bias, mean, var):
        if train:
            m, v = h.mean(axis=(0, 1, 2)), h.var(axis=(0, 1, 2))
        else:
            m, v = mean, var
        return (h - m) / np.sqrt(v + eps) * scale + bias

    h = bn(conv(x, params["conv1_kernel"]), params["bn1_scale"],
           params["bn1_bias"], stats["bn1_mean"], stats["bn1_var"])
    h = jnp.maximum(h, 0)
    h = bn(conv(h, params["conv2_kernel"]), params["bn2_scale"],
           params["bn2_bias"], stats["bn2_mean"], stats["bn2_var"])
    return jnp.maximum(h + x, 0)


@pytest.fixture
def block_setup(rng):
    c = 8
    m = FusedResBlock(c)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    # randomize params/stats so the test is non-trivial
    params = jax.tree.map(
        lambda p: p + 0.05 * rng.standard_normal(p.shape).astype(np.float32),
        variables["params"])
    stats = {"bn1_mean": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
             "bn1_var": jnp.asarray(np.abs(rng.standard_normal(c)) + 0.5, jnp.float32),
             "bn2_mean": jnp.zeros(c), "bn2_var": jnp.ones(c)}
    return m, x, params, stats


def test_train_mode_matches_manual(block_setup):
    m, x, params, stats = block_setup
    out, mut = m.apply({"params": params, "batch_stats": stats}, x,
                       train=True, mutable=["batch_stats"])
    want = manual_res_block(np.asarray(x), params, stats, train=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4,
                               atol=1e-5)
    # running stats updated with momentum 0.9 (flax convention)
    h1 = jax.lax.conv_general_dilated(
        x, params["conv1_kernel"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want_mean = 0.9 * np.asarray(stats["bn1_mean"]) \
        + 0.1 * np.asarray(h1.mean(axis=(0, 1, 2)))
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["bn1_mean"]),
                               want_mean, rtol=1e-4, atol=1e-6)


def test_eval_mode_matches_manual(block_setup):
    m, x, params, stats = block_setup
    out = m.apply({"params": params, "batch_stats": stats}, x, train=False)
    want = manual_res_block(np.asarray(x), params, stats, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4,
                               atol=1e-5)


def test_cvae_with_fused_blocks_trains_and_paints():
    arch = fiducial_cvae_architecture(tile_size=32, n_res_blocks=1,
                                      fused_res_blocks=True)
    model = CVAE(arch)
    x = jnp.ones((2, 32, 32, 1)) * 0.2
    y = jnp.ones((2, 32, 32, 1)) * 0.1
    aux = jnp.array([0.0, 0.5])
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)}, x, y, aux)
    # fused params present in the tree
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    assert any("FusedResBlock" in "/".join(str(k) for k in path)
               for path, _ in flat)
    out, _ = model.apply(variables, x, y, aux, train=True,
                         rngs={"sample": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["elbo"]))

    def loss(params):
        o, _ = model.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           x, y, aux, train=True,
                           rngs={"sample": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
        return -o["elbo"]

    g = jax.grad(loss)(variables["params"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g))
    pred = model.apply(variables, y, aux, train=False,
                       rngs={"sample": jax.random.PRNGKey(3)},
                       method=model.sample_P)
    assert pred.shape == (2, 32, 32, 1)
    assert np.all(np.isfinite(np.asarray(pred)))
