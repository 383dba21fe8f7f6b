"""Model tests: layer shape parity with torch conventions, DSL, CVAE ELBO."""
import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baryon_painter_tpu.models import dsl
from baryon_painter_tpu.models.cvae import (CVAE, fiducial_cvae_architecture,
                                            stats_from_outputs)
from baryon_painter_tpu.models.layers import (Conv2d, ConvTranspose2d,
                                              SpecSequential, merge_aux_label)


# --------------------------------------------------------------------- #
# Torch shape-convention parity
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("n,k,s,p,want", [
    (512, 4, 2, 1, 256),   # scale=2 block
    (256, 8, 4, 2, 64),    # scale=4 block
    (64, 8, 4, 2, 16),
    (64, 5, 1, 2, 64),     # scale=1, kernel 5
    (16, 3, 1, 1, 16),
])
def test_conv_output_sizes(n, k, s, p, want):
    m = Conv2d(features=2, kernel_size=k, stride=s, padding=p)
    x = jnp.zeros((1, n, n, 1))
    y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (1, want, want, 2)


@pytest.mark.parametrize("n,k,s,p,want", [
    (16, 4, 2, 1, 32),     # scale=2 transp
    (32, 8, 4, 2, 128),    # scale=4 transp
    (128, 8, 4, 2, 512),
    (64, 7, 1, 3, 64),     # scale=1, kernel 7
])
def test_conv_transpose_output_sizes(n, k, s, p, want):
    m = ConvTranspose2d(features=3, kernel_size=k, stride=s, padding=p)
    x = jnp.zeros((1, n, n, 1))
    y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (1, want, want, 3)


@pytest.mark.slow
def test_spec_sequential_conv_down_up():
    spec = tuple(map(tuple, dsl.conv_down(1, [8, 16, 32], [2, 4, 4])))
    m = SpecSequential(spec)
    x = jnp.zeros((2, 128, 128, 1))
    y, vars_ = m.init_with_output(jax.random.PRNGKey(0), x, train=False)
    assert y.shape == (2, 4, 4, 32)
    spec_up = tuple(map(tuple, dsl.conv_up(32, [16, 8, 1], [4, 4, 2])))
    m2 = SpecSequential(spec_up)
    y2, _ = m2.init_with_output(jax.random.PRNGKey(0), y, train=False)
    assert y2.shape == (2, 128, 128, 1)


@pytest.mark.slow
def test_resize_conv_upsampling():
    """Anti-checkerboard conv_up variant: same output shapes as transpose."""
    spec = tuple(map(tuple, dsl.conv_up(8, [4, 2, 1], [2, 4, 4],
                                        mode="resize")))
    m = SpecSequential(spec)
    x = jnp.zeros((1, 4, 4, 8))
    y, _ = m.init_with_output(jax.random.PRNGKey(0), x, train=False)
    assert y.shape == (1, 128, 128, 1)
    from baryon_painter_tpu.models.cvae import CVAE, fiducial_cvae_architecture
    arch = fiducial_cvae_architecture(tile_size=64, n_res_blocks=1,
                                      upsample="resize")
    model = CVAE(arch)
    xx = jnp.zeros((1, 64, 64, 1))
    out, _ = model.init_with_output(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        xx, xx, jnp.array([0.0]))
    assert np.isfinite(float(out["elbo"]))
    with pytest.raises(ValueError):
        dsl.conv_up(8, [4], [2], mode="bogus")


def test_residual_block_identity_at_zero():
    spec = (("residual block", dsl.res_block(4)),)
    m = SpecSequential(spec)
    x = jnp.ones((1, 8, 8, 4))
    y, variables = m.init_with_output(jax.random.PRNGKey(3), x, train=False)
    assert y.shape == x.shape
    # zero out all conv kernels -> res block reduces to relu(identity)
    zeroed = jax.tree.map(jnp.zeros_like, variables["params"])
    y0 = m.apply({"params": zeroed,
                  "batch_stats": variables["batch_stats"]}, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(jnp.maximum(x, 0)),
                               atol=1e-6)


def test_merge_aux_label():
    y = jnp.zeros((3, 8, 8, 2))
    out = merge_aux_label(y, jnp.array([0.0, 0.5, 1.0]))
    assert out.shape == (3, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out[1, :, :, 2]), 0.5)
    with pytest.raises(ValueError):
        merge_aux_label(y, jnp.array([0.0, 1.0]))


def test_batchnorm_updates_stats():
    spec = tuple(map(tuple, dsl.conv_block(1, 4, kernel=3)))
    m = SpecSequential(spec)
    x = jnp.ones((2, 8, 8, 1))
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    _, updates = m.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


# --------------------------------------------------------------------- #
# CVAE
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def small_arch():
    return fiducial_cvae_architecture(tile_size=64, n_res_blocks=1)


@pytest.fixture(scope="module")
def cvae_setup(small_arch):
    model = CVAE(small_arch)
    x = jnp.ones((2, 64, 64, 1)) * 0.3
    y = jnp.ones((2, 64, 64, 1)) * 0.1
    aux = jnp.array([0.0, 1.0])
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)}, x, y, aux)
    return model, variables, x, y, aux


def test_cvae_forward_shapes_and_elbo(cvae_setup):
    model, variables, x, y, aux = cvae_setup
    out, _ = model.apply(variables, x, y, aux, train=True,
                         rngs={"sample": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    assert out["x_mu"].shape == (2, 64, 64, 1)
    assert out["log_likelihood"].shape == (1,)
    assert np.isfinite(float(out["elbo"]))
    assert float(out["kl"]) >= 0 or True  # KL vs learned prior can be any sign? no:
    # analytic KL between two Gaussians is always >= 0
    assert float(out["kl"]) >= -1e-5
    stats = stats_from_outputs(out)
    assert len(stats) == len(model.get_stats_labels()) == 5


def test_cvae_elbo_matches_manual_formula(small_arch):
    """Golden check of the ELBO assembly against a direct numpy computation
    using the model's own intermediate outputs."""
    model = CVAE(small_arch)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
    aux = jnp.array([0.5, 1.5])
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)}, x, y, aux)
    out, _ = model.apply(variables, x, y, aux, train=True, alpha_var=0.3,
                         beta_KL=2.0, rngs={"sample": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    ll = (1 - 0.3) * np.asarray(out["log_likelihood_fixed_var"]) \
        + 0.3 * np.asarray(out["log_likelihood_free_var"])
    np.testing.assert_allclose(np.asarray(out["log_likelihood"]), ll, rtol=1e-6)
    want_elbo = -float(out["kl"]) * 2.0 + ll.sum()
    np.testing.assert_allclose(float(out["elbo"]), want_elbo, rtol=1e-5)


def test_cvae_kl_zero_when_q_equals_prior(small_arch):
    """If q and the prior emit identical params, KL must be 0."""
    model = CVAE(small_arch)
    x = jnp.zeros((1, 64, 64, 1))
    y = jnp.zeros((1, 64, 64, 1))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)}, x, y,
                           jnp.array([0.0]))

    def kl_direct(mu_q, lv_q, mu_p, lv_p):
        var_p = np.exp(lv_p)
        return 0.5 * np.sum((mu_p - mu_q) ** 2 / var_p + np.exp(lv_q) / var_p
                            + lv_p - lv_q - 1)

    mu = np.zeros((1, 2, 2, 1), np.float32)
    assert kl_direct(mu, mu, mu, mu) == 0.0
    kl = kl_direct(mu + 1, mu, mu, mu)
    assert kl > 0


def test_cvae_sample_p_shapes(cvae_setup):
    model, variables, x, y, aux = cvae_setup
    pred = model.apply(variables, y, aux, train=False,
                       rngs={"sample": jax.random.PRNGKey(5)},
                       method=model.sample_P)
    assert pred.shape == (2, 64, 64, 1)
    mu, var = model.apply(variables, y, aux, return_var=True, train=False,
                          rngs={"sample": jax.random.PRNGKey(5)},
                          method=model.sample_P)
    assert var.shape == (2, 64, 64, 1)
    assert np.all(np.asarray(var) > 0)
    # z given -> deterministic decode
    z = jnp.zeros((2, 2, 2, 1))
    p1 = model.apply(variables, y, aux, z=z, train=False, method=model.sample_P)
    p2 = model.apply(variables, y, aux, z=z, train=False, method=model.sample_P)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


def test_cvae_fiducial_param_count():
    """Fiducial 512-tile architecture lands at the reference's ~1.67M params
    (BASELINE.md: parameter count from trained_models architecture)."""
    arch = fiducial_cvae_architecture(tile_size=512, n_res_blocks=4)
    model = CVAE(arch)
    x = jnp.zeros((1, 512, 512, 1))
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)},
                           x, x, jnp.array([0.0])))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    assert 1.4e6 < n_params < 2.0e6, n_params


@pytest.mark.slow
def test_cvae_grads_finite(small_arch):
    model = CVAE(small_arch)
    x = jnp.ones((2, 64, 64, 1)) * 0.2
    y = jnp.ones((2, 64, 64, 1)) * 0.1
    aux = jnp.array([0.0, 0.5])
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)}, x, y, aux)

    def loss(params):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             x, y, aux, train=True,
                             rngs={"sample": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
        return -out["elbo"]

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # and at least some are non-zero
    assert any(np.any(np.asarray(l) != 0) for l in leaves)
