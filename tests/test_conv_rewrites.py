"""MXU conv rewrites must be EXACTLY the same math as the plain lowering."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.ops.conv_rewrites import (
    conv_via_space_to_depth, s2d_rewrite_applicable, transp_conv_as_conv,
    transp_conv_rewrite_applicable)

# quick-tier exclusion: per-variant conv compiles (run with the full suite)
pytestmark = pytest.mark.slow


def _transp_conv_dilated(x, w, s, p):
    pad = w.shape[0] - 1 - p
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(pad, pad)] * 2,
        lhs_dilation=(s, s), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_same(x, w, p):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(p, p)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("k,s,p,cin,cout", [
    (4, 2, 1, 32, 16),   # DSL scale=2 upsampler
    (8, 4, 2, 16, 8),    # DSL scale=4 upsampler
    (4, 2, 1, 1, 1),     # p_z_in latent upsampler
])
def test_transp_conv_rewrite_exact(rng, k, s, p, cin, cout):
    assert transp_conv_rewrite_applicable(k, s, p, 0)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)), jnp.float32)
    ref = _transp_conv_dilated(x, w, s, p)
    out = transp_conv_as_conv(x, w, s, p)
    assert out.shape == ref.shape == (2, 12 * s, 12 * s, cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_transp_conv_rewrite_gradients_match(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, 4, 6)), jnp.float32)

    g_ref = jax.grad(lambda w: _transp_conv_dilated(x, w, 2, 1).sum())(w)
    g_new = jax.grad(lambda w: transp_conv_as_conv(x, w, 2, 1).sum())(w)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)
    gx_ref = jax.grad(lambda x: (_transp_conv_dilated(x, w, 2, 1) ** 2).sum())(x)
    gx_new = jax.grad(lambda x: (transp_conv_as_conv(x, w, 2, 1) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,cin,cout,r", [
    (7, 16, 8, 4),   # p_y_z_out head conv 1
    (5, 8, 1, 4),    # p_y_z_out head conv 2
    (3, 1, 1, 4),    # p_y_z_out head conv 3
    (5, 3, 16, 4),   # p_y_z_in entry conv
    (3, 16, 8, 2),
])
def test_s2d_conv_rewrite_exact(rng, k, cin, cout, r):
    p = (k - 1) // 2
    h = 32 * r
    assert s2d_rewrite_applicable(k, 1, p, h, h, cin, r)
    x = jnp.asarray(rng.standard_normal((2, h, h, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)), jnp.float32)
    ref = _conv_same(x, w, p)
    out = conv_via_space_to_depth(x, w, p, r)
    assert out.shape == ref.shape
    # same math, different accumulation order: error ~ eps * sqrt(K)
    scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4 * scale)


def test_s2d_conv_rewrite_gradients_match(rng):
    k, p, r = 5, 2, 4
    x = jnp.asarray(rng.standard_normal((1, 32 * r, 32 * r, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, 2, 3)), jnp.float32)
    g_ref = jax.grad(lambda w: (_conv_same(x, w, p) ** 2).sum())(w)
    g_new = jax.grad(lambda w: (conv_via_space_to_depth(x, w, p, r) ** 2).sum())(w)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-2)


def test_applicability_gates():
    assert not transp_conv_rewrite_applicable(4, 2, 1, 1)  # output_padding
    assert not transp_conv_rewrite_applicable(3, 1, 1, 0)  # not strided
    assert not transp_conv_rewrite_applicable(12, 4, 2, 0)  # window too wide
    assert not transp_conv_rewrite_applicable(8, 4, 6, 0)   # p > s
    assert not s2d_rewrite_applicable(4, 1, 1, 512, 512, 8, 4)   # even k
    assert not s2d_rewrite_applicable(7, 1, 3, 510, 510, 8, 4)   # h % r
    assert not s2d_rewrite_applicable(7, 2, 3, 512, 512, 8, 4)   # strided
    assert not s2d_rewrite_applicable(7, 1, 3, 512, 512, 64, 4)  # big cin
    assert not s2d_rewrite_applicable(7, 1, 3, 512, 512, 8, 2)   # window
    assert s2d_rewrite_applicable(7, 1, 3, 512, 512, 16, 4)
    assert s2d_rewrite_applicable(5, 1, 2, 512, 512, 8, 4)


def test_cvae_forward_same_with_rewrites(rng, monkeypatch):
    """Full fiducial CVAE forward at 128^2 (both rewrites trigger) must be
    unchanged when the MXU rewrites are disabled."""
    from baryon_painter_tpu.models.cvae import (CVAE,
                                                fiducial_cvae_architecture)

    arch = fiducial_cvae_architecture(tile_size=128, n_res_blocks=1)
    model = CVAE(arch)
    x = jnp.asarray(rng.standard_normal((2, 128, 128, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 128, 128, 1)), jnp.float32)
    aux = jnp.asarray([0.0, 1.0], jnp.float32)

    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)}, x, y, aux)

    def forward():
        out, _ = model.apply(variables, x, y, aux, train=True,
                             rngs={"sample": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
        return out

    out_on = forward()
    monkeypatch.setenv("BPT_DISABLE_CONV_REWRITES", "1")
    out_off = forward()
    np.testing.assert_allclose(float(out_on["elbo"]), float(out_off["elbo"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_on["x_mu"]),
                               np.asarray(out_off["x_mu"]),
                               rtol=1e-3, atol=1e-4)
