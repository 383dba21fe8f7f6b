"""Fused train-mode conv+BN+ReLU kernel: equality + full-grad parity.

Covers both lowerings (transp-conv 3-window on the coarse grid; stride-1
fine conv via in-kernel space-to-depth) against a plain-XLA train-mode
reference, including gradients THROUGH the batch statistics, and the
SpecSequential triple fusion (identical parameter trees + running-stat
updates). Interpret mode on CPU; float32 for tight tolerances.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.ops import conv_rewrites as cr
from baryon_painter_tpu.ops.pallas_conv_bn import fused_conv_bn_relu

EPS = 1e-5


def ref_transp(x, w, gamma, beta, s, p):
    k = w.shape[0]
    u = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k - 1 - p, k - 1 - p)] * 2, lhs_dilation=(s, s),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _bn_relu(u)


def ref_s2d(x, w, gamma, beta, p):
    u = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _bn_relu(u)


def _bn_relu(u):
    def f(gamma, beta):
        mu = u.mean((0, 1, 2))
        var = (u * u).mean((0, 1, 2)) - mu * mu
        inv = jax.lax.rsqrt(var + EPS)
        y = jnp.maximum((u - mu) * (gamma * inv) + beta, 0.0)
        return y, mu, var
    return f


def fused_transp(x, w, gamma, beta, s, p):
    w2 = cr._transp_kernel_3window(w, s, p)
    return fused_conv_bn_relu(x, w2, gamma, beta, 0, s, EPS, True)


def fused_s2d(x, w, gamma, beta, p):
    w2 = cr._s2d_kernel_3window(w, 4, p)
    return fused_conv_bn_relu(x, w2, gamma, beta, 4, 4, EPS, True)


CASES = [
    # (kind, x_shape, w_shape, s, p)  — the DSL's scale-2 transp conv and
    # the trunk-in-style stride-1 k5 conv
    ("transp", (2, 8, 8, 6), (4, 4, 6, 5), 2, 1),
    ("transp", (2, 4, 4, 3), (8, 8, 3, 2), 4, 2),
    ("s2d", (2, 16, 16, 3), (5, 5, 3, 4), 1, 2),
    # coarse grid taller than one 32-row strip: exercises the kernels'
    # strip loops, including the bwd dx halo across strip boundaries
    ("transp", (1, 40, 12, 3), (4, 4, 3, 4), 2, 1),
    # exactly 2 full strips, no ragged tail: the pure fori_loop path
    ("transp", (1, 64, 12, 3), (4, 4, 3, 4), 2, 1),
]


@pytest.mark.parametrize("kind,xs,ws,s,p", CASES)
def test_forward_matches_reference(kind, xs, ws, s, p):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(xs), jnp.float32)
    w = jnp.asarray(rng.standard_normal(ws) * 0.3, jnp.float32)
    c = ws[-1]
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    if kind == "transp":
        y, mu, var = fused_transp(x, w, gamma, beta, s, p)
        u = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(ws[0] - 1 - p,) * 2] * 2, lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        y, mu, var = fused_s2d(x, w, gamma, beta, p)
        u = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    yr, mur, varr = _bn_relu(u)(gamma, beta)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mur),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(varr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("bwd2", ["windows", "xla"])
@pytest.mark.parametrize("kind,xs,ws,s,p", CASES)
def test_gradients_match_reference(kind, xs, ws, s, p, bwd2, monkeypatch):
    # both backward variants (Pallas blocked-window kernels / the XLA
    # fallback for VMEM-oversized shapes) must be gradient-exact;
    # production picks by the VMEM fit heuristic
    monkeypatch.setenv("BPT_CONV_BN_BWD2", bwd2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(xs), jnp.float32)
    w = jnp.asarray(rng.standard_normal(ws) * 0.3, jnp.float32)
    c = ws[-1]
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)

    def make_loss(fn):
        cot = None

        def loss(x_, w_, g_, b_):
            nonlocal cot
            y, mu, var = fn(x_, w_, g_, b_)
            if cot is None:
                cot = jnp.asarray(
                    np.random.default_rng(2).standard_normal(y.shape),
                    jnp.float32)
            # running-stat consumers see stop_gradient(mean/var)
            return jnp.sum(y * cot) + 0.0 * jnp.sum(
                jax.lax.stop_gradient(mu + var))
        return loss

    if kind == "transp":
        fused = lambda *a: fused_transp(*a, s, p)

        def unfused(x_, w_, g_, b_):
            k = ws[0]
            u = jax.lax.conv_general_dilated(
                x_, w_, (1, 1), [(k - 1 - p,) * 2] * 2, lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return _bn_relu(u)(g_, b_)
    else:
        fused = lambda *a: fused_s2d(*a, p)

        def unfused(x_, w_, g_, b_):
            u = jax.lax.conv_general_dilated(
                x_, w_, (1, 1), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return _bn_relu(u)(g_, b_)

    gf = jax.grad(make_loss(fused), argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    gx = jax.grad(make_loss(unfused), argnums=(0, 1, 2, 3))(x, w, gamma,
                                                            beta)
    for nm, a, b in zip(("dx", "dw", "dgamma", "dbeta"), gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=f"gradient mismatch in {nm}")


def test_spec_sequential_fusion_matches(monkeypatch):
    """The (transp conv, batchnorm, relu) triple under BPT_FUSED_TRAIN_CONV
    produces the same outputs, gradients, parameter tree and running-stat
    updates as the unfused interpreter."""
    from baryon_painter_tpu.models import layers as layers_mod
    from baryon_painter_tpu.models.layers import SpecSequential
    from baryon_painter_tpu.ops import pallas_conv_bn

    # out_channels must be >= 8: the fusion gate rejects tiny-channel
    # layers, and with fewer the flagged run silently takes the unfused
    # path and this test compares the unfused interpreter to itself
    spec = (
        ("transp conv", {"in_channels": 6, "out_channels": 8,
                         "kernel_size": 4, "padding": 1, "stride": 2,
                         "bias": False}),
        ("batchnorm", {"num_features": 8}),
        ("ReLU",),
        ("conv", {"in_channels": 8, "out_channels": 3, "kernel_size": 3,
                  "padding": 1, "stride": 1, "bias": False}),
    )
    mod = SpecSequential(spec)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)), jnp.float32)
    monkeypatch.setenv("BPT_FUSED_TRAIN_CONV", "0")
    variables = mod.init(jax.random.PRNGKey(0), x)

    fused_calls = []
    real_fused = pallas_conv_bn.fused_conv_bn_relu

    def spy(*a, **kw):
        fused_calls.append(1)
        return real_fused(*a, **kw)

    monkeypatch.setattr(pallas_conv_bn, "fused_conv_bn_relu", spy)

    def run(flag):
        monkeypatch.setenv("BPT_FUSED_TRAIN_CONV", flag)

        def loss(params):
            y, upd = mod.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return jnp.sum(y ** 2), (y, upd)
        (l, (y, upd)), g = jax.value_and_grad(loss, has_aux=True)(
            variables["params"])
        return l, y, upd, g

    l0, y0, upd0, g0 = run("0")
    assert not fused_calls, "unfused run must not hit the fused kernel"
    l1, y1, upd1, g1 = run("1")
    # value_and_grad traces once: forward+backward through one fused call
    assert len(fused_calls) == 1, "fused path was not actually taken"
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-5)
    # identical running-stat updates
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(upd1["batch_stats"]["BatchNorm_0"][k]),
            np.asarray(upd0["batch_stats"]["BatchNorm_0"][k]),
            rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)
