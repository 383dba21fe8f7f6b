"""Equivalence of the low-HBM BatchNorm/PReLU vs flax.linen.

The custom layers (models/layers.py) exist purely for HBM-traffic reasons on
TPU; semantically they must be indistinguishable from flax.linen.BatchNorm /
nn.PReLU (which themselves match torch.nn.BatchNorm2d/PReLU as used by the
reference, models/utils.py:40-157) — same forward values, same gradients,
same running-stat updates, and byte-identical parameter/variable trees so
committed checkpoints interchange.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.models.layers import BatchNorm, PReLU


def _trees_equal_structure(a, b):
    return (jax.tree_util.tree_structure(a)
            == jax.tree_util.tree_structure(b))


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-6),
                                       (jnp.bfloat16, 2e-2)])
def test_batchnorm_forward_and_stats_match_flax(dtype, tol):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 8)) * 3 + 1, dtype)

    ours = BatchNorm(use_running_average=False, momentum=0.9, dtype=dtype)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, dtype=dtype)

    v0_ours = ours.init(jax.random.PRNGKey(0), x)
    v0_ref = ref.init(jax.random.PRNGKey(0), x)
    assert _trees_equal_structure(v0_ours, v0_ref)

    # Nudge params off their init values so the affine part is exercised.
    v0 = jax.tree_util.tree_map(lambda p: p + 0.25, v0_ref)
    y_ours, m_ours = ours.apply(v0, x, mutable=["batch_stats"])
    y_ref, m_ref = ref.apply(v0, x, mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(y_ours, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=tol, atol=tol)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(m_ours["batch_stats"][k]),
            np.asarray(m_ref["batch_stats"][k]), rtol=1e-5, atol=1e-5)


def test_batchnorm_eval_path_matches_flax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    vars_ = {
        "params": {"scale": jnp.asarray(rng.normal(size=4) + 1.0, jnp.float32),
                   "bias": jnp.asarray(rng.normal(size=4), jnp.float32)},
        "batch_stats": {"mean": jnp.asarray(rng.normal(size=4), jnp.float32),
                        "var": jnp.asarray(rng.uniform(0.5, 2.0, 4),
                                           jnp.float32)},
    }
    y_ours = BatchNorm(use_running_average=True).apply(vars_, x)
    y_ref = nn.BatchNorm(use_running_average=True).apply(vars_, x)
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)


def test_batchnorm_gradients_match_flax():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 12, 12, 6)) * 2, jnp.float32)
    dy = jnp.asarray(rng.normal(size=(4, 12, 12, 6)), jnp.float32)

    def run(mod, variables, xx):
        y, _ = mod.apply(variables, xx, mutable=["batch_stats"])
        return jnp.sum(y * dy)

    ours = BatchNorm(use_running_average=False)
    ref = nn.BatchNorm(use_running_average=False)
    v0 = ref.init(jax.random.PRNGKey(0), x)
    v0 = jax.tree_util.tree_map(lambda p: p + 0.5, v0)

    g_ours = jax.grad(lambda v, xx: run(ours, v, xx), argnums=(0, 1))(v0, x)
    g_ref = jax.grad(lambda v, xx: run(ref, v, xx), argnums=(0, 1))(v0, x)

    np.testing.assert_allclose(np.asarray(g_ours[1]), np.asarray(g_ref[1]),
                               rtol=2e-5, atol=2e-5)  # dx
    for k in ("scale", "bias"):
        np.testing.assert_allclose(
            np.asarray(g_ours[0]["params"][k]),
            np.asarray(g_ref[0]["params"][k]), rtol=2e-5, atol=2e-5)


def test_batchnorm_bf16_residual_dtype():
    """The training-path VJP must stash the bf16 input, not an f32 copy —
    that is the whole point of the custom layer. Verified structurally via
    the jaxpr of the VJP: no f32 tensor of the activation's size may be a
    residual."""
    x = jnp.zeros((2, 64, 64, 8), jnp.bfloat16)
    mod = BatchNorm(use_running_average=False, dtype=jnp.bfloat16)
    v0 = mod.init(jax.random.PRNGKey(0), x)

    def f(xx):
        y, _ = mod.apply(v0, xx, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32))

    # linearize exposes the residuals as constants of the linearized fn
    _, f_vjp = jax.vjp(f, x)
    big_f32 = [v for v in jax.tree_util.tree_leaves(f_vjp)
               if hasattr(v, "dtype") and v.dtype == jnp.float32
               and v.size >= x.size]
    assert not big_f32, f"f32 activation-sized residuals leaked: {big_f32}"


def test_prelu_matches_flax_and_param_tree():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 3)), jnp.float32)
    ours = PReLU()
    ref = nn.PReLU(negative_slope_init=0.25)
    v_ours = ours.init(jax.random.PRNGKey(0), x)
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    assert _trees_equal_structure(v_ours, v_ref)

    v = {"params": {"negative_slope": jnp.asarray(0.37, jnp.float32)}}
    np.testing.assert_allclose(np.asarray(ours.apply(v, x)),
                               np.asarray(ref.apply(v, x)),
                               rtol=1e-6, atol=1e-6)

    g_ours = jax.grad(lambda vv: jnp.sum(ours.apply(vv, x) ** 2))(v)
    g_ref = jax.grad(lambda vv: jnp.sum(ref.apply(vv, x) ** 2))(v)
    np.testing.assert_allclose(
        np.asarray(g_ours["params"]["negative_slope"]),
        np.asarray(g_ref["params"]["negative_slope"]), rtol=1e-5)


def test_committed_checkpoint_loads_with_custom_layers():
    """The fiducial-512 flagship was trained before the custom BatchNorm
    landed; its param tree must apply cleanly through the new layers."""
    import os
    base = os.path.join(os.path.dirname(__file__), os.pardir,
                        "trained_models", "archive",
                        "CVAE-fiducial-transpose-256")
    if not os.path.isdir(base):
        pytest.skip("no committed checkpoint")
    from baryon_painter_tpu.painter import CVAEPainter
    p = CVAEPainter(filename=os.path.join(base, "model"))
    n = p.model.tile_size if hasattr(p.model, "tile_size") else 256
    tile = np.exp(np.random.default_rng(0).normal(
        size=(n, n)).astype(np.float32))
    out = p.paint(tile, z=0.0, transform=True, inverse_transform=True)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
