"""Fused train-mode head stack: forward equality + full-gradient parity.

Interpret mode on CPU (same kernel code path as TPU modulo Mosaic
lowering); float32 for tight tolerances.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.ops.pallas_head_stack import (head_stack,
                                                      head_stack_xla)

N, H, W, CIN, C1, NH = 2, 16, 16, 4, 8, 3
PADS = (3, 2, 1)


def make_inputs(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((N, H, W, CIN)), dtype)
    w1 = jnp.asarray(rng.standard_normal((NH, 7, 7, CIN, C1)) * 0.2, dtype)
    w2 = jnp.asarray(rng.standard_normal((NH, 5, 5, C1, 1)) * 0.2, dtype)
    w3 = jnp.asarray(rng.standard_normal((NH, 3, 3, 1, 1)) * 0.5, dtype)
    al = jnp.asarray(rng.uniform(0.1, 0.5, (NH, 2)), jnp.float32)
    return x, w1, w2, w3, al


def test_forward_matches_xla():
    x, w1, w2, w3, al = make_inputs()
    got = head_stack(x, w1, w2, w3, al, PADS, True)
    want = head_stack_xla(x, w1, w2, w3, al, PADS)
    assert got.shape == (N, NH, H, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_xla():
    x, w1, w2, w3, al = make_inputs(1)
    # a non-trivial scalar loss exercising all heads/pixels unevenly
    rng = np.random.default_rng(2)
    cot = jnp.asarray(rng.standard_normal((N, NH, H, W)), jnp.float32)

    def loss_fused(*a):
        return jnp.sum(head_stack(*a, PADS, True) * cot)

    def loss_xla(*a):
        return jnp.sum(head_stack_xla(*a, PADS) * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, w2, w3, al)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, w1, w2, w3, al)
    for name, a, b in zip(("dx", "dw1", "dw2", "dw3", "dalpha"), gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"gradient mismatch in {name}")


def test_cvae_fused_heads_match_unfused(monkeypatch):
    """BPT_FUSED_HEADS=1 routes the CVAE's output heads through the fused
    kernel with IDENTICAL parameter trees; outputs and parameter gradients
    must match the unfused path."""
    from baryon_painter_tpu.models.cvae import (CVAE,
                                                fiducial_cvae_architecture)

    arch = fiducial_cvae_architecture(tile_size=64, n_res_blocks=1)
    model = CVAE(arch)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2,)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)}, x, y, z)

    def elbo(params, bstats):
        out, _ = model.apply(
            {"params": params, "batch_stats": bstats}, x, y, z,
            train=True, rngs={"sample": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return out["elbo"]

    monkeypatch.setenv("BPT_FUSED_HEADS", "0")
    e0, g0 = jax.value_and_grad(elbo)(variables["params"],
                                      variables["batch_stats"])
    monkeypatch.setenv("BPT_FUSED_HEADS", "1")
    e1, g1 = jax.value_and_grad(elbo)(variables["params"],
                                      variables["batch_stats"])
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-4)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    # near-zero leaves (e.g. a 1-channel BN scale grad, pure cancellation)
    # carry only float noise: floor each leaf's scale at 1e-6 of the
    # global gradient magnitude
    gmax = max(float(jnp.abs(a).max()) for a in flat0)
    for a, b in zip(flat0, flat1):
        scale = max(float(jnp.abs(a).max()), 1e-4 * gmax)
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale,
                                   rtol=5e-3, atol=5e-4)


def test_bf16_forward_close():
    x, w1, w2, w3, al = make_inputs(3, dtype=jnp.bfloat16)
    got = np.asarray(head_stack(x, w1, w2, w3, al, PADS, True),
                     np.float32)
    want = np.asarray(head_stack_xla(x, w1, w2, w3, al, PADS), np.float32)
    scale = max(np.abs(want).max(), 1e-3)
    assert np.abs(got - want).max() / scale < 0.05
