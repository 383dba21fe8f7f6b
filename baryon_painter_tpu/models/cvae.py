"""Conditional VAE, TPU-native flax implementation.

Same probabilistic structure as the reference (models/cvae.py:8-199):
recognition net Q(z|x,y), optional prior net p(z|y), generator P(x|y,z) with
optional predicted output variance, analytic Gaussian KL, reparameterization
with a variance floor, alpha_var/beta_KL annealing knobs, and redshift
conditioning via constant aux feature maps.

The architecture is the same declarative dict DSL as the reference
(keys: type, dim_x/y/z, n_x_features, aux_label, prior_z_y, q_x_in, q_y_in,
q_x_y_out, p_y_in, p_z_in, p_y_z_in, p_y_z_out, min_x_var, min_z_var, L,
likelihood_scaling, x_var_init_std; cvae.py:16-58) so fiducial configs port
1:1. Tensors are NHWC internally; z_mu/z_log_var are produced by splitting the
2*C_z output channels (replacing the reference's channel-first unflatten).

The ELBO is identical term-for-term to cvae.py:122-147 (sum over pixels,
averaged over batch and MC samples; per-output-channel log-likelihoods), so
loss curves are directly comparable to the published training logs.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from baryon_painter_tpu.models import dsl
from baryon_painter_tpu.models.layers import (SpecSequential, merge_aux_label,
                                              torch_conv_init)

LOG_2PI = math.log(2 * math.pi)


def _normal_init(std):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def _strip_unflatten(spec):
    if spec is None:
        return None
    return tuple(tuple(l) if not isinstance(l, tuple) else l
                 for l in spec if str(l[0]).lower() != "unflatten")


class CVAE(nn.Module):
    architecture: dict
    dtype: Optional[Any] = None  # compute dtype for convs (e.g. bfloat16)

    def setup(self):
        arch = self.architecture
        if arch.get("type", "Type-1") != "Type-1":
            raise NotImplementedError(
                f"Architecture {arch.get('type')} not supported yet!")
        self.dim_x = tuple(arch["dim_x"])  # channel-first (C,H,W), parity
        self.dim_y = tuple(arch["dim_y"])
        self.dim_z = tuple(arch["dim_z"])
        self.n_x_features = arch["n_x_features"]
        self.L = arch.get("L", 1)
        self.use_aux_label = arch.get("aux_label", False)
        self.min_z_var = arch.get("min_z_var", 1e-7)
        self.min_x_var = arch.get("min_x_var", 1e-7)
        self.likelihood_scaling = arch.get("likelihood_scaling", 1.0)

        fused = arch.get("fused_res_blocks", False)
        mk = lambda key: SpecSequential(_strip_unflatten(arch[key]),
                                        dtype=self.dtype,
                                        fused_res_blocks=fused)
        self.q_x_in = mk("q_x_in")
        self.q_y_in = mk("q_y_in")
        self.q_out = mk("q_x_y_out")
        self.p_y_in = SpecSequential(_strip_unflatten(arch.get("p_y_in")),
                                     dtype=self.dtype)
        self.p_z_in = mk("p_z_in")
        self.p_y_z_in = mk("p_y_z_in")
        self.p_mu_out = SpecSequential(_strip_unflatten(arch["p_y_z_out"][0]),
                                       dtype=self.dtype)
        self.predict_var = len(arch["p_y_z_out"]) > 1
        if self.predict_var:
            std = arch.get("x_var_init_std", 0.01)
            self.p_var_out = SpecSequential(
                _strip_unflatten(arch["p_y_z_out"][1]), dtype=self.dtype,
                kernel_init=_normal_init(std))
        if "prior_z_y" in arch and arch["prior_z_y"] is not None:
            self.prior_network = SpecSequential(
                _strip_unflatten(arch["prior_z_y"]), dtype=self.dtype)
        else:
            self.prior_network = None

    # ------------------------------------------------------------------ #

    def _merge_aux(self, y, aux_label):
        if aux_label is not None and self.use_aux_label:
            return merge_aux_label(y, aux_label)
        return y

    def _split_heads(self, h):
        """(N,H,W,2*Cz) -> z_mu, z_log_var each (N,H,W,Cz)."""
        cz = self.dim_z[0]
        if h.shape[-1] != 2 * cz:
            raise ValueError(
                f"Head produced {h.shape[-1]} channels, expected {2 * cz} "
                f"for dim_z={self.dim_z}.")
        return h[..., :cz], h[..., cz:]

    def Q(self, x, y, aux_label=None, train: bool = True):
        y = self._merge_aux(y, aux_label)
        h_x = self.q_x_in(x, train=train)
        h_y = self.q_y_in(y, train=train)
        h = jnp.concatenate([h_x, h_y], axis=-1)
        h = self.q_out(h, train=train)
        return self._split_heads(h)

    def prior(self, y, aux_label=None, train: bool = True):
        if self.prior_network is None:
            cz, hz, wz = self.dim_z
            shape = (y.shape[0], hz, wz, cz)
            return jnp.zeros(shape, y.dtype), jnp.zeros(shape, y.dtype)
        y = self._merge_aux(y, aux_label)
        h = self.prior_network(y, train=train)
        return self._split_heads(h)

    def sample_z(self, rng, z_mu, z_log_var, L: int = 1):
        """Reparameterized sample; z = mu + eps*(exp(logvar/2) + min_z_var)
        (cvae.py:63-66)."""
        eps = jax.random.normal(rng, (L, *z_mu.shape), z_mu.dtype)
        z = z_mu[None] + eps * (jnp.exp(z_log_var[None] / 2) + self.min_z_var)
        return z.reshape(-1, *z_mu.shape[1:])

    def _heads_fusable(self, h) -> bool:
        """Both output heads match the canonical (conv k7, prelu, conv k5,
        prelu, conv k3[, softplus]) pattern at fused-kernel-compatible
        shapes. Gated by BPT_FUSED_HEADS=1 (A/B flag; docs/roofline.md)."""
        import os
        if os.environ.get("BPT_FUSED_HEADS", "0") != "1":
            return False
        if not self.predict_var or self.is_initializing():
            # init must run the unfused path so the parameter tree is
            # created identically (the fused path only READS child params)
            return False
        if h.shape[1] % 4 or h.shape[2] % 4 or h.shape[1] < 32:
            return False
        heads = self.architecture["p_y_z_out"]
        # _fused_heads hardcodes the trailing activations: softplus on
        # head 0 (mu), raw conv output on head 1 (log-var) — reject any
        # spec whose tail differs or it would be silently mis-evaluated
        tails = (["softplus"], [])
        for spec, tail in zip(heads, tails):
            names = [str(l[0]).lower() for l in spec]
            if names[:5] != ["conv", "prelu", "conv", "prelu", "conv"]:
                return False
            if names[5:] != tail:
                return False
            ks = [l[1]["kernel_size"] for l in spec if l[0] == "conv"]
            ps = [l[1]["padding"] for l in spec if l[0] == "conv"]
            ss = [l[1].get("stride", 1) for l in spec if l[0] == "conv"]
            bs = [l[1].get("bias", True) for l in spec if l[0] == "conv"]
            if (ks, ps, ss) != ([7, 5, 3], [3, 2, 1], [1, 1, 1]) or any(bs):
                return False
            if [l[1]["out_channels"] for l in spec if l[0] == "conv"] != \
                    [8, 1, 1]:
                return False
        return True

    def _fused_heads(self, h):
        """Run both output heads through the fused train-mode Pallas stack
        (ops/pallas_head_stack.py): the 512^2 head input is read once per
        (sample, head) instead of XLA's many HBM round trips (~20% of
        decoder fwd+bwd bytes, docs/ab/pnet_breakdown_r4.json). Parameters
        are READ from the existing child modules, so checkpoints and the
        parameter tree are identical to the unfused path."""
        from baryon_painter_tpu.ops.pallas_head_stack import head_stack
        pm = self.p_mu_out.variables["params"]
        pv = self.p_var_out.variables["params"]
        stack = lambda key, sub: jnp.stack([pm[sub][key], pv[sub][key]])
        w1 = stack("kernel", "Conv2d_0")
        w2 = stack("kernel", "Conv2d_1")
        w3 = stack("kernel", "Conv2d_2")
        alphas = jnp.stack(
            [jnp.stack([pm["PReLU_0"]["negative_slope"],
                        pm["PReLU_1"]["negative_slope"]]),
             jnp.stack([pv["PReLU_0"]["negative_slope"],
                        pv["PReLU_1"]["negative_slope"]])])
        # interpret mode keeps the path testable on the CPU mesh; the
        # Mosaic lowering only exists on TPU
        out = head_stack(h, w1, w2, w3, alphas, (3, 2, 1),
                         jax.default_backend() != "tpu")
        # head 0 (mu) ends in softplus; head 1 (log-var) is raw conv output
        x_mu = jax.nn.softplus(out[:, 0])[..., None]
        x_log_var = out[:, 1][..., None]
        return x_mu.astype(h.dtype), x_log_var.astype(h.dtype)

    def P(self, z, y, aux_label=None, L: int = 1, train: bool = True):
        y = self._merge_aux(y, aux_label)
        h_y = self.p_y_in(y, train=train)
        h_z = self.p_z_in(z, train=train)
        h_y = jnp.tile(h_y, (L, 1, 1, 1))
        h = jnp.concatenate([h_z, h_y], axis=-1)
        h = self.p_y_z_in(h, train=train)
        if self._heads_fusable(h):
            return self._fused_heads(h)
        x_mu = self.p_mu_out(h, train=train)
        if self.predict_var:
            x_log_var = self.p_var_out(h, train=train)
            return x_mu, x_log_var
        return (x_mu,)

    # ------------------------------------------------------------------ #

    def __call__(self, x, y, aux_label=None, alpha_var: float = 1.0,
                 beta_KL: float = 1.0, train: bool = True,
                 sample_weight=None):
        """ELBO and per-term stats; mirrors cvae.py:122-147.

        x: (N,H,W,C_x) transformed target field(s); y: (N,H,W,C_y) input.
        Returns a dict: elbo, kl, log_likelihood (per output channel), plus
        fixed/free-variance components when variance is predicted.

        ``sample_weight``: optional (N,) importance weights multiplying each
        sample's KL and log-likelihood contribution (mean weight should be
        ~1). Used by the mesh-sharded data path to undo the per-device
        z-sampling skew (data/device_cache.py): equal per-device batch
        quotas over-sample redshifts on under-populated devices, and
        weighting by 1/rate_z restores the uniform-z expected gradient.
        ``None`` is exactly the unweighted reference ELBO.
        """
        M = x.shape[0]
        z_mu, z_log_var = self.Q(x, y, aux_label, train=train)
        # latent heads are tiny; do the KL/reparam math in float32 so a
        # bfloat16 compute dtype cannot underflow the KL term
        z_mu = z_mu.astype(jnp.float32)
        z_log_var = z_log_var.astype(jnp.float32)
        z = self.sample_z(self.make_rng("sample"), z_mu, z_log_var, self.L)

        prior_mu, prior_log_var = self.prior(y, aux_label, train=train)
        prior_mu = prior_mu.astype(jnp.float32)
        prior_log_var = prior_log_var.astype(jnp.float32)
        prior_var = jnp.exp(prior_log_var)
        kl_elem = ((prior_mu - z_mu) ** 2 / prior_var
                   + jnp.exp(z_log_var) / prior_var
                   + prior_log_var - z_log_var - 1.0)
        if sample_weight is not None:
            w = jnp.asarray(sample_weight, jnp.float32)
            kl = 0.5 / M * jnp.sum(w * kl_elem.sum(axis=(1, 2, 3)))
        else:
            kl = 0.5 / M * jnp.sum(kl_elem)

        params = self.P(z, y, aux_label, L=self.L, train=train)
        x_mu = params[0]
        x_rep = jnp.tile(x, (self.L, 1, 1, 1))
        sq = (x_rep - x_mu.astype(x.dtype)) ** 2
        norm = M * self.L
        if sample_weight is not None:
            w_rep = jnp.tile(w, (self.L,))[:, None, None, None].astype(x.dtype)
        else:
            w_rep = None
        wsum = (lambda t: (w_rep * t).sum(axis=(0, 1, 2))) \
            if w_rep is not None else (lambda t: t.sum(axis=(0, 1, 2)))
        out = {"kl": kl}
        if self.predict_var:
            x_log_var = params[1].astype(x.dtype)
            x_var = jnp.exp(x_log_var)
            ll_fixed = -0.5 * LOG_2PI + wsum(-0.5 * sq) / norm
            ll_free = -0.5 * LOG_2PI + wsum(
                -0.5 * x_log_var - 0.5 * sq / x_var) / norm
            ll = (1 - alpha_var) * ll_fixed + alpha_var * ll_free
            out.update(log_likelihood_fixed_var=ll_fixed,
                       log_likelihood_free_var=ll_free,
                       x_var=x_var)
        else:
            ll = -0.5 * LOG_2PI + wsum(-0.5 * sq) / norm
        out["log_likelihood"] = ll
        out["x_mu"] = x_mu
        out["elbo"] = -kl * beta_KL + self.likelihood_scaling * ll.sum()
        return out

    def sample_prior(self, y, aux_label=None, train: bool = False):
        z_mu, z_log_var = self.prior(y, aux_label, train=train)
        return self.sample_z(self.make_rng("sample"), z_mu, z_log_var, 1)

    def sample_P(self, y, aux_label=None, z=None, return_var: bool = False,
                 train: bool = False):
        """Paint: sample z from the prior and decode (cvae.py:149-162)."""
        if z is None:
            z = self.sample_prior(y, aux_label, train=train)
        p = self.P(z, y, aux_label, L=1, train=train)
        if return_var and self.predict_var:
            return p[0], jnp.exp(p[1])
        return p[0]

    # ------------------------------------------------------------------ #

    def get_stats_labels(self):
        # Uses the raw architecture dict (callable outside init/apply).
        n_x = self.architecture["n_x_features"]
        predict_var = len(self.architecture["p_y_z_out"]) > 1
        labels = ["ELBO", "KL_term"] + [
            f"log_likelihood_{i}" for i in range(n_x)]
        if predict_var:
            labels += [f"log_likelihood_fixed_var_{i}" for i in range(n_x)]
            labels += [f"log_likelihood_free_var_{i}" for i in range(n_x)]
        return labels


def count_parameters(params) -> int:
    """Total trainable parameter count (cvae.py:182-183 equivalent)."""
    import jax
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def print_model_statistics(params, percentile: float = 0.9):
    """Parameter-count distribution report (cvae.py:185-194 equivalent)."""
    import flax
    import jax
    flat = flax.traverse_util.flatten_dict(params)
    sizes = sorted(((int(np.prod(p.shape)), "/".join(k))
                    for k, p in flat.items()), reverse=True)
    total = sum(n for n, _ in sizes)
    print(f"Total number of parameters: {total}")
    print(f"Top {percentile * 100:.0f}% of all parameters are in the "
          f"following layers")
    cum = 0
    for n, name in sizes:
        if cum >= total * percentile:
            break
        cum += n
        print(f"{name:<60s} {n:>10d}")
    return total


def stats_from_outputs(out: dict) -> tuple:
    """Flatten a CVAE output dict to the reference stats tuple order
    (cvae.py:164-171): (ELBO, -KL, *ll[, *ll_fixed, *ll_free])."""
    vals = [float(out["elbo"]), -float(out["kl"])]
    vals += [float(v) for v in np.asarray(out["log_likelihood"])]
    if "log_likelihood_fixed_var" in out:
        vals += [float(v) for v in np.asarray(out["log_likelihood_fixed_var"])]
        vals += [float(v) for v in np.asarray(out["log_likelihood_free_var"])]
    return tuple(vals)


def fiducial_cvae_architecture(tile_size: int = 512, n_scale: int = 1,
                               n_aux_label: int = 1, n_label_fields: int = 1,
                               n_res_blocks: int = 4,
                               predict_var: bool = True,
                               fused_res_blocks: bool = False,
                               upsample: str = "transpose") -> dict:
    """The fiducial architecture of scripts/CVAE_single_scale.py:98-138,
    parameterized by tile size (fully convolutional: dim_z scales with it)."""
    n_x = n_label_fields * n_scale
    dim_x = (n_x, tile_size, tile_size)
    dim_y = (n_scale, tile_size, tile_size)
    dim_z = (1, tile_size // 32, tile_size // 32)

    p_y_z_out_mu = (
        dsl.conv_block(16, 8, kernel=7, bias=False, batchnorm=False,
                       activation="PReLU")
        + dsl.conv_block(8, n_x, kernel=5, bias=False, batchnorm=False,
                         activation="PReLU")
        + dsl.conv_block(n_x, n_x, kernel=3, bias=False, batchnorm=False,
                         activation="softplus"))
    p_y_z_out = [p_y_z_out_mu]
    if predict_var:
        p_y_z_out.append(
            dsl.conv_block(16, 8, kernel=7, bias=False, batchnorm=False,
                           activation="PReLU")
            + dsl.conv_block(8, n_x, kernel=5, bias=False, batchnorm=False,
                             activation="PReLU")
            + dsl.conv_block(n_x, n_x, kernel=3, bias=False, batchnorm=False,
                             activation=None))

    return {
        "type": "Type-1",
        "dim_x": dim_x,
        "dim_y": dim_y,
        "dim_z": dim_z,
        "n_x_features": n_x,
        "aux_label": True,
        "prior_z_y": (dsl.conv_down(in_channel=n_scale + n_aux_label,
                                    channels=[8, 16, 32], scales=[2, 4, 4])
                      + dsl.conv_block(32, 2 * dim_z[0], kernel=5)),
        "q_x_in": dsl.conv_down(in_channel=n_x, channels=[8, 16, 32],
                                scales=[2, 4, 4]),
        "q_y_in": dsl.conv_down(in_channel=n_scale + n_aux_label,
                                channels=[8, 16, 32], scales=[2, 4, 4]),
        "q_x_y_out": dsl.conv_block(64, 2 * dim_z[0], kernel=5),
        "p_y_in": None,
        "p_z_in": dsl.conv_up(1, channels=[1, 1, 1], scales=[2, 4, 4],
                              bias=False, batchnorm=True, mode=upsample),
        "p_y_z_in": (dsl.conv_block(n_aux_label + n_scale + 1, 16, kernel=5)
                     + dsl.conv_down(in_channel=16, channels=[32, 64, 128],
                                     scales=[2, 2, 2])
                     + [("residual block", dsl.res_block(128))
                        for _ in range(n_res_blocks)]
                     + dsl.conv_up(128, channels=[64, 32, 16], scales=[2, 2, 2],
                                   bias=False, batchnorm=True,
                                   activation="ReLU", mode=upsample)),
        "p_y_z_out": tuple(p_y_z_out),
        "min_x_var": 1e-7,
        "min_z_var": 1e-7,
        "L": 1,
        "fused_res_blocks": fused_res_blocks,
    }
