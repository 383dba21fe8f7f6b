"""Torch-oracle parity for the CGAN generator and discriminator
(models/cgan.py; architecture from the reference's
trained_models/README.md:95-139).

The twin is assembled by tests/test_torch_oracle.py's spec interpreter from
the same body/head specs, carrying the flax parameters with each kernel
divided by its *exact* SVD spectral norm. flax's SpectralNorm approximates
that scale by power iteration from a stored u vector, so the model is first
driven through enough update_stats=True steps for u to converge; eval
outputs must then agree with the SVD-normalized oracle. This pins the
z-feature conditioning (f(z) = z - 1 constant maps), the discriminator's
(dm, z, pressure) concat order, the body/head split (Kaiming vs
Xavier(0.25) init scopes), and the spectral normalization itself against
independent code.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from baryon_painter_tpu.models.cgan import (CGANDiscriminator, CGANGenerator,
                                            cgan_discriminator_spec,
                                            cgan_generator_spec, z_feature)
from test_torch_oracle import torch_from_spec

SIZE = 32
N_ITER = 150  # power-iteration steps to converge every stored u


def _t(a):  # NHWC numpy -> NCHW torch
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def _nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


def _converge_sn(model, variables, *args):
    """Run update_stats=True applies until the SpectralNorm u vectors (and
    the BN running stats the same passes update) are converged/settled."""
    for _ in range(N_ITER):
        _, upd = model.apply(variables, *args, train=True,
                             mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": upd["batch_stats"]}
    return variables


def _merged_input(y, z):
    n, h, w, _ = y.shape
    zmap = np.broadcast_to(
        np.asarray(z_feature(z), np.float32)[:, None, None, None],
        (n, h, w, 1))
    return np.concatenate([y, zmap], axis=-1)


@pytest.mark.slow
def test_generator_matches_svd_normalized_oracle():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, SIZE, SIZE, 1)).astype(np.float32)
    z = np.array([0.0, 1.5], np.float32)

    model = CGANGenerator(n_res_blocks=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(y),
                           jnp.asarray(z), train=True)
    variables = _converge_sn(model, variables, jnp.asarray(y),
                             jnp.asarray(z))
    out = model.apply(variables, jnp.asarray(y), jnp.asarray(z), train=False)

    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    body_spec, head_spec = cgan_generator_spec(n_res_blocks=2)
    body = torch_from_spec(body_spec, params["SpecSequential_0"],
                           stats["SpecSequential_0"], spectral_norm=True)
    head = torch_from_spec(head_spec, params["SpecSequential_1"],
                           stats["SpecSequential_1"], spectral_norm=True)
    body.eval(), head.eval()
    with torch.no_grad():
        t_out = head(body(_t(_merged_input(y, z)))).numpy()

    assert t_out.shape == (2, 1, SIZE, SIZE)
    np.testing.assert_allclose(_nchw(out), t_out, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_discriminator_matches_svd_normalized_oracle():
    rng = np.random.default_rng(1)
    y = rng.standard_normal((2, SIZE, SIZE, 1)).astype(np.float32)
    x = rng.standard_normal((2, SIZE, SIZE, 1)).astype(np.float32)
    z = np.array([0.5, 2.0], np.float32)

    model = CGANDiscriminator()
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(y),
                           jnp.asarray(z), jnp.asarray(x), train=True)
    variables = _converge_sn(model, variables, jnp.asarray(y),
                             jnp.asarray(z), jnp.asarray(x))
    out = model.apply(variables, jnp.asarray(y), jnp.asarray(z),
                      jnp.asarray(x), train=False)

    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    body_spec, head_spec = cgan_discriminator_spec()
    body = torch_from_spec(body_spec, params["SpecSequential_0"],
                           stats.get("SpecSequential_0", {}),
                           spectral_norm=True)
    head = torch_from_spec(head_spec, params["SpecSequential_1"],
                           stats.get("SpecSequential_1", {}),
                           spectral_norm=True)
    body.eval(), head.eval()
    merged = np.concatenate([_merged_input(y, z), x], axis=-1)
    with torch.no_grad():
        t_out = head(body(_t(merged))).numpy()

    # per-patch probabilities in (0, 1)
    assert t_out.min() > 0.0 and t_out.max() < 1.0
    np.testing.assert_allclose(_nchw(out), t_out, rtol=5e-3, atol=5e-3)
