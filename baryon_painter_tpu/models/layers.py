"""Flax building blocks interpreting the layer DSL, NHWC / TPU-native.

Shape semantics match PyTorch's conventions so the reference's fiducial
architectures line up exactly (SURVEY §7 'conv-transpose parity'):

  * Conv2d:          out = floor((in + 2p - k)/s) + 1
  * ConvTranspose2d: out = (in - 1)*s - 2p + k

Internally everything is NHWC (TPU's preferred layout); the channel counts in
the DSL are unchanged. Convs run on the MXU with a configurable compute dtype
(bfloat16 by default for training speed; parameters stay float32).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from baryon_painter_tpu.ops import conv_rewrites as _cr

__all__ = ["Conv2d", "ConvTranspose2d", "SpecSequential", "ResidualBlock",
           "merge_aux_label", "torch_conv_init"]

Dtype = Any


def _rewrites_enabled() -> bool:
    """MXU conv rewrites (ops/conv_rewrites.py) are exact and on by default;
    BPT_DISABLE_CONV_REWRITES=1 falls back to the naive lowerings."""
    return os.environ.get("BPT_DISABLE_CONV_REWRITES", "0") != "1"


def torch_conv_init(key, shape, dtype=jnp.float32):
    """PyTorch Conv2d default init: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = k*k*C_in."""
    kh, kw, cin, _ = shape
    bound = 1.0 / np.sqrt(kh * kw * cin)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def kaiming_normal_init(key, shape, dtype=jnp.float32):
    """He-normal (fan_in, ReLU gain); CGAN init scheme
    (trained_models/README.md:102)."""
    kh, kw, cin, _ = shape
    std = np.sqrt(2.0 / (kh * kw * cin))
    return std * jax.random.normal(key, shape, dtype)


def xavier_init(gain: float):
    """Glorot-uniform with gain; the CGAN's last-layer init
    (trained_models/README.md:102, gain=0.25)."""
    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        bound = gain * np.sqrt(6.0 / (kh * kw * (cin + cout)))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Conv2d(nn.Module):
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Any = torch_conv_init

    @nn.compact
    def __call__(self, x, return_kernel: bool = False):
        k, s, p = self.kernel_size, self.stride, self.padding
        cin = x.shape[-1]
        out_h = (x.shape[1] + 2 * p - k) // s + 1
        if out_h <= 0:
            raise ValueError(
                f"Conv2d(k={k}, s={s}, p={p}) on a {x.shape[1]}x{x.shape[2]} "
                f"input produces a {out_h}-pixel output; the tile is too "
                f"small for this architecture.")
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, cin, self.features))
        if return_kernel:
            # fused-train-conv path (SpecSequential): the caller computes
            # the conv inside a Pallas kernel from this module's parameter
            # — same name/shape, no compute here
            return kernel
        dtype = self.dtype or x.dtype
        # Prefer the deeper r=4 space-to-depth: it needs fewer MXU tile ops
        # AND moves fewer bytes than r=2 (A/B r3: fwd+bwd 102.8 ms / 70.9 GB
        # vs 115.9 ms / 79.5 GB with r=2 first), despite a larger 3x3-window
        # kernel expansion. BPT_S2D_ORDER=24 flips the preference for
        # experiments.
        _order_env = os.environ.get("BPT_S2D_ORDER", "42")
        if _order_env not in ("42", "24"):
            # a typo here would silently measure the default order
            raise ValueError(
                f"BPT_S2D_ORDER={_order_env!r}: expected '42' or '24'")
        _order = (2, 4) if _order_env == "24" else (4, 2)
        r = next((r for r in _order
                  if _cr.s2d_rewrite_applicable(k, s, p, x.shape[1],
                                                x.shape[2], cin, r)
                  and _cr.s2d_rewrite_profitable(k, cin, self.features, r)),
                 None) if _rewrites_enabled() else None
        if r is not None:
            out = _cr.conv_via_space_to_depth(x.astype(dtype),
                                              kernel.astype(dtype), p, r)
        else:
            out = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype),
                window_strides=(s, s), padding=[(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32,
                    -1.0 / np.sqrt(k * k * cin), 1.0 / np.sqrt(k * k * cin)),
                (self.features,))
            out = out + bias
        return out


class ConvTranspose2d(nn.Module):
    """Fractionally-strided conv with PyTorch's output-size convention:
    out = (in - 1)*stride - 2*padding + kernel + output_padding."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Any = torch_conv_init

    @nn.compact
    def __call__(self, x, return_kernel: bool = False):
        k, s, p = self.kernel_size, self.stride, self.padding
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, cin, self.features))
        if return_kernel:
            return kernel  # fused-train-conv path; see Conv2d
        dtype = self.dtype or x.dtype
        pad = k - 1 - p
        if pad < 0:
            raise ValueError(f"Unsupported transp-conv padding: k={k}, p={p}.")
        if (_rewrites_enabled() and _cr.transp_conv_rewrite_applicable(
                k, s, p, self.output_padding)):
            out = _cr.transp_conv_as_conv(x.astype(dtype),
                                          kernel.astype(dtype), s, p)
        else:
            pad_cfg = [(pad, pad + self.output_padding)] * 2
            out = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype),
                window_strides=(1, 1), padding=pad_cfg,
                lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32,
                    -1.0 / np.sqrt(k * k * cin), 1.0 / np.sqrt(k * k * cin)),
                (self.features,))
            out = out + bias
        return out


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train(x, gamma, beta, eps):
    out, _ = _bn_train_fwd_res(x, gamma, beta, eps)
    return out  # (y, batch_mean, batch_var)


def _bn_train_fwd_res(x, gamma, beta, eps):
    axes = tuple(range(x.ndim - 1))
    # The barrier pins x to its storage dtype: without it XLA hoists the
    # f32 convert below into the producing conv's output (convs accumulate
    # f32 anyway), and every layout/d2s copy between conv and BN then moves
    # f32 instead of bf16 (measured r3: the depth-to-space copies of the
    # decoder's transposed convs doubled to 400 MB each).
    x = jax.lax.optimization_barrier(x)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axes)
    ms = jnp.mean(xf * xf, axes)
    var = ms - mu * mu  # fast variance (flax use_fast_variance semantics)
    inv = jax.lax.rsqrt(var + eps)
    a = gamma * inv
    b = beta - mu * a
    y = (xf * a + b).astype(x.dtype)
    return (y, mu, var), (x, mu, inv, gamma)


def _bn_train_fwd(x, gamma, beta, eps):
    (y, mu, var), res = _bn_train_fwd_res(x, gamma, beta, eps)
    return (y, mu, var), res


def _bn_train_bwd(eps, res, cts):
    # Cotangents for the (mu, var) outputs are zero by construction (they
    # only feed the stop_gradient'ed running-stat update).
    dy, _, _ = cts
    x, mu, inv, gamma = res
    axes = tuple(range(x.ndim - 1))
    n = float(np.prod([x.shape[i] for i in axes]))
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    g1 = jnp.sum(dyf, axes)                    # = dbeta
    g2 = jnp.sum(dyf * xf, axes)
    dgamma = inv * (g2 - mu * g1)              # = sum(dy * xhat)
    a = gamma * inv
    dx = (a * (dyf - g1 / n - (xf - mu) * inv * (dgamma / n))).astype(x.dtype)
    return dx, dgamma, g1


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


class BatchNorm(nn.Module):
    """Drop-in ``flax.linen.BatchNorm`` replacement with a low-HBM-traffic
    training path.

    flax's BatchNorm promotes the full activation tensor to float32 for the
    normalize chain and stashes float32 residuals for the backward pass; at
    512^2 tiles those 400 MB buffers dominated the train step's HBM traffic
    (roofline r3: fwd+bwd ran at 84% of HBM bandwidth). This module keeps
    activations in the compute dtype (bf16) in HBM - float32 arithmetic
    happens only inside fusions - via a custom VJP whose residual is the
    bf16 input plus per-channel float32 vectors:

      fwd:  1 stats pass (f32-accumulated reduce over bf16 x)
            + 1 fused normalize pass (read x, write y, both bf16)
      bwd:  1 fused double-reduce pass (read x, dy)
            + 1 fused dx pass (read x, dy; write dx)

    Scope, parameter and variable names match flax.linen.BatchNorm
    ("BatchNorm_N"; params scale/bias; batch_stats mean/var) so existing
    checkpoints load unchanged. Statistics semantics are flax's: fast
    (E[x^2]-E[x]^2) batch variance, running stats updated with the biased
    batch variance, momentum as the keep-fraction.
    """

    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, fused_stats=None, params_only: bool = False,
                 n_features: Optional[int] = None):
        """Normal mode: normalize x. Fused-train-conv modes (the conv+BN+act
        Pallas kernel computes the normalize itself; ops/pallas_conv_bn.py):
        ``params_only=True`` returns (scale, bias) without compute;
        ``fused_stats=(batch_mean, batch_var)`` records the kernel-computed
        statistics into the running averages and returns None. Both modes
        declare the identical parameters/variables, so the tree matches the
        normal path (``n_features`` supplies C when x is None)."""
        c = x.shape[-1] if x is not None else n_features
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if params_only:
            return gamma, beta
        if fused_stats is not None:
            mu, var = fused_stats
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (m * ra_mean.value
                                 + (1 - m) * jax.lax.stop_gradient(mu))
                ra_var.value = (m * ra_var.value
                                + (1 - m) * jax.lax.stop_gradient(var))
            return None
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        if self.use_running_average:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            a = gamma * inv
            b = beta - ra_mean.value * a
            return (x.astype(jnp.float32) * a + b).astype(dtype)
        y, mu, var = _bn_train(x, gamma, beta, self.epsilon)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = (m * ra_mean.value
                             + (1 - m) * jax.lax.stop_gradient(mu))
            ra_var.value = (m * ra_var.value
                            + (1 - m) * jax.lax.stop_gradient(var))
        return y


class PReLU(nn.Module):
    """torch-style PReLU (single learnable slope, init 0.25) computed in
    x.dtype.

    flax's nn.PReLU promotes the activation to the f32 slope's dtype, which
    materializes full-resolution f32 tensors in HBM on the bf16 path (the
    decoder output heads run PReLU at 512^2). Scope name and parameter name
    ("PReLU_N"/"negative_slope") match flax's so checkpoints interchange.
    """

    negative_slope_init: float = 0.25

    @nn.compact
    def __call__(self, x):
        slope = self.param(
            "negative_slope",
            lambda k: jnp.full((), self.negative_slope_init, jnp.float32))
        return jnp.where(x >= 0, x, slope.astype(x.dtype) * x)


class ResidualBlock(nn.Module):
    """x -> act(inner(x) + x); models/utils.py:22-38."""

    inner_spec: Tuple
    activation: Tuple
    dtype: Optional[Dtype] = None
    spectral_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = SpecSequential(tuple(map(tuple, self.inner_spec)), dtype=self.dtype,
                           spectral_norm=self.spectral_norm)(x, train=train)
        h = h + x
        return _activation_from_spec(tuple(self.activation))(h)


def _act_slope(layer):
    """(leaky-)ReLU slope of an activation spec entry, or None if it is
    neither: ('ReLU',) -> 0.0, ('Leaky ReLU', s) -> s (default 0.2)."""
    name = str(layer[0]).lower()
    if name == "relu":
        return 0.0
    if name == "leaky relu":
        return float(layer[1]) if len(layer) > 1 and layer[1] is not None \
            else 0.2
    return None


def _canonical_res_block_slopes(config):
    """``(inner_slope, outer_slope)`` when a residual-block spec is the
    canonical conv3x3/bn/act/conv3x3/bn shape with (leaky-)ReLU activations
    (dsl.res_block: ReLU; the CGAN generator's blocks: LeakyReLU(0.2)),
    else ``None``."""
    inner, act = config
    outer_slope = _act_slope(act)
    if outer_slope is None:
        return None
    names = [str(l[0]).lower() for l in inner]
    if (len(names) != 5
            or names != ["conv", "batchnorm", names[2], "conv", "batchnorm"]):
        return None
    inner_slope = _act_slope(inner[2])
    if inner_slope is None:
        return None
    c1, c2 = inner[0][1], inner[3][1]
    for c in (c1, c2):
        if (c["kernel_size"], c.get("stride", 1), c.get("padding", 0),
                c.get("bias", True)) != (3, 1, 1, False):
            return None
    if not (c1["in_channels"] == c1["out_channels"] == c2["out_channels"]):
        return None
    return inner_slope, outer_slope


def _is_canonical_res_block(config):
    """True when the spec can dispatch to FusedResBlock."""
    return _canonical_res_block_slopes(config) is not None


class FusedResBlock(nn.Module):
    """Canonical residual block with explicitly-declared parameters so the
    eval path can run as ONE fused Pallas kernel (ops/pallas_conv.py).

    Train mode reproduces flax BatchNorm semantics exactly (batch statistics,
    running-stat update with momentum 0.9, eps 1e-5) using plain XLA ops, so
    gradients flow normally; eval mode folds BN and dispatches to the fused
    kernel on TPU (XLA fallback elsewhere).
    """

    features: int
    dtype: Optional[Dtype] = None
    inner_slope: float = 0.0   # (leaky-)ReLU slopes; 0.0 = plain ReLU
    outer_slope: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = self.features
        w1 = self.param("conv1_kernel", torch_conv_init, (3, 3, c, c))
        w2 = self.param("conv2_kernel", torch_conv_init, (3, 3, c, c))
        scale1 = self.param("bn1_scale", nn.initializers.ones, (c,))
        bias1 = self.param("bn1_bias", nn.initializers.zeros, (c,))
        scale2 = self.param("bn2_scale", nn.initializers.ones, (c,))
        bias2 = self.param("bn2_bias", nn.initializers.zeros, (c,))
        mean1 = self.variable("batch_stats", "bn1_mean",
                              lambda: jnp.zeros((c,), jnp.float32))
        var1 = self.variable("batch_stats", "bn1_var",
                             lambda: jnp.ones((c,), jnp.float32))
        mean2 = self.variable("batch_stats", "bn2_mean",
                              lambda: jnp.zeros((c,), jnp.float32))
        var2 = self.variable("batch_stats", "bn2_var",
                             lambda: jnp.ones((c,), jnp.float32))
        eps, momentum = 1e-5, 0.9
        dtype = self.dtype or x.dtype

        def conv(v, w):
            return jax.lax.conv_general_dilated(
                v.astype(dtype), w.astype(dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        from baryon_painter_tpu.ops.pallas_conv import (_leaky, fold_bn,
                                                        res_block_infer,
                                                        res_block_infer_xla)
        if train:
            h = conv(x, w1).astype(jnp.float32)
            m1 = h.mean(axis=(0, 1, 2))
            v1 = h.var(axis=(0, 1, 2))
            if not self.is_initializing():
                mean1.value = momentum * mean1.value + (1 - momentum) * m1
                var1.value = momentum * var1.value + (1 - momentum) * v1
            h = (h - m1) * jax.lax.rsqrt(v1 + eps) * scale1 + bias1
            h = _leaky(h, self.inner_slope)
            h = conv(h, w2).astype(jnp.float32)
            m2 = h.mean(axis=(0, 1, 2))
            v2 = h.var(axis=(0, 1, 2))
            if not self.is_initializing():
                mean2.value = momentum * mean2.value + (1 - momentum) * m2
                var2.value = momentum * var2.value + (1 - momentum) * v2
            h = (h - m2) * jax.lax.rsqrt(v2 + eps) * scale2 + bias2
            return _leaky(h + x.astype(jnp.float32),
                          self.outer_slope).astype(x.dtype)

        s1, b1 = fold_bn(scale1, bias1, mean1.value, var1.value, eps)
        s2, b2 = fold_bn(scale2, bias2, mean2.value, var2.value, eps)
        fn = (res_block_infer if jax.default_backend() == "tpu"
              else res_block_infer_xla)
        return fn(x.astype(dtype), w1, s1, b1, w2, s2, b2,
                  inner_slope=self.inner_slope,
                  outer_slope=self.outer_slope)


def _activation_from_spec(layer):
    name = layer[0]
    if name is None:
        return lambda x: x
    name = name.lower()
    if name == "relu":
        return nn.relu
    if name == "leaky relu":
        slope = layer[1] if len(layer) > 1 else 0.2
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    if name == "tanh":
        return jnp.tanh
    if name == "sigmoid":
        return nn.sigmoid
    if name == "softplus":
        return nn.softplus
    raise NotImplementedError(f"Activation {name} not supported yet!")


class SpecSequential(nn.Module):
    """Interpret a layer-spec list (see models/dsl.py) as a flax module.

    Mirrors build_sequential (models/utils.py:114-157). ``spec=None`` is the
    identity (reference behavior for e.g. p_y_in=None).
    ``spectral_norm=True`` wraps every parametric layer in spectral
    normalization (for the CGAN; trained_models/README.md:101).
    """

    spec: Optional[Tuple]
    dtype: Optional[Dtype] = None
    spectral_norm: bool = False
    kernel_init: Any = torch_conv_init
    fused_res_blocks: bool = False

    def _wrap(self, module):
        if self.spectral_norm:
            return nn.SpectralNorm(module)
        return module

    def _train_conv_fusion(self, spec, i, x, train):
        """When layers (i, i+1, i+2) form a fusable (conv|transp conv,
        batchnorm, relu) triple under BPT_FUSED_TRAIN_CONV=1, return
        ("transp"|"s2d", k, s, p, cout); else None. See
        ops/pallas_conv_bn.py and docs/ab/pnet_breakdown_r4.json (the up
        chain + input conv carry ~56% of decoder fwd+bwd bytes)."""
        if os.environ.get("BPT_FUSED_TRAIN_CONV", "0") != "1":
            return None
        if (not train or self.is_initializing() or self.spectral_norm
                or os.environ.get("BPT_FLAX_BN", "").lower()
                not in ("", "0", "false")):
            return None
        if i + 2 >= len(spec):
            return None
        if (str(spec[i + 1][0]).lower() != "batchnorm"
                or str(spec[i + 2][0]).lower() != "relu"):
            return None
        cfg = spec[i][1]
        if cfg.get("bias", True):
            return None
        k = cfg["kernel_size"]
        s = cfg.get("stride", 1)
        p = cfg.get("padding", 0)
        cin, cout = x.shape[-1], cfg["out_channels"]
        if cout < 8:
            # tiny-channel layers (e.g. the 1-channel p_z_in upsamplers)
            # gain nothing and produce Mosaic-hostile partial shapes
            return None
        kind = str(spec[i][0]).lower()
        if kind == "transp conv":
            if (cfg.get("output_padding", 0) == 0
                    and _cr.transp_conv_rewrite_applicable(k, s, p, 0)
                    and x.shape[1] * s % 8 == 0):
                return ("transp", k, s, p, cout)
            return None
        r = 4
        if (_cr.s2d_rewrite_applicable(k, s, p, x.shape[1], x.shape[2],
                                       cin, r)
                and _cr.s2d_rewrite_profitable(k, cin, cout, r)):
            return ("s2d", k, s, p, cout)
        return None

    def _apply_fused_train_conv(self, m, x, fuse, train):
        import jax as _jax

        from baryon_painter_tpu.ops.pallas_conv_bn import fused_conv_bn_relu
        kind, k, s, p, cout = fuse
        dtype = self.dtype or x.dtype
        w = m(x, return_kernel=True)
        if kind == "transp":
            w2 = _cr._transp_kernel_3window(w.astype(dtype), s, p)
            in_radix, out_radix = 0, s
        else:
            w2 = _cr._s2d_kernel_3window(w.astype(dtype), 4, p)
            in_radix, out_radix = 4, 4
        bn = BatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype)
        gamma, beta = bn(None, params_only=True, n_features=cout)
        y, mu, var = fused_conv_bn_relu(
            x.astype(dtype), w2, gamma, beta, in_radix, out_radix, 1e-5,
            _jax.default_backend() != "tpu")
        bn(None, fused_stats=(mu, var), n_features=cout)
        return y

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.spec is None:
            return x
        sn_kw = {"update_stats": train} if self.spectral_norm else {}
        spec = list(self.spec)
        i = -1
        skip_until = 0
        for i, layer in enumerate(spec):
            if i < skip_until:
                continue
            name = layer[0]
            config = layer[1] if len(layer) > 1 else None
            lname = name.lower() if isinstance(name, str) else name
            if lname == "conv":
                m = self._wrap(Conv2d(
                    features=config["out_channels"],
                    kernel_size=config["kernel_size"],
                    stride=config.get("stride", 1),
                    padding=config.get("padding", 0),
                    use_bias=config.get("bias", True),
                    dtype=self.dtype, kernel_init=self.kernel_init))
                fuse = self._train_conv_fusion(spec, i, x, train)
                if fuse is not None:
                    x = self._apply_fused_train_conv(m, x, fuse, train)
                    skip_until = i + 3  # consumed batchnorm + relu
                    continue
                x = m(x, **sn_kw) if sn_kw else m(x)
            elif lname == "transp conv":
                m = self._wrap(ConvTranspose2d(
                    features=config["out_channels"],
                    kernel_size=config["kernel_size"],
                    stride=config.get("stride", 1),
                    padding=config.get("padding", 0),
                    output_padding=config.get("output_padding", 0),
                    use_bias=config.get("bias", True),
                    dtype=self.dtype, kernel_init=self.kernel_init))
                fuse = self._train_conv_fusion(spec, i, x, train)
                if fuse is not None:
                    x = self._apply_fused_train_conv(m, x, fuse, train)
                    skip_until = i + 3
                    continue
                x = m(x, **sn_kw) if sn_kw else m(x)
            elif lname == "linear":
                m = self._wrap(nn.Dense(features=config["out_features"],
                                        use_bias=config.get("bias", True),
                                        dtype=self.dtype))
                x = m(x, **sn_kw) if sn_kw else m(x)
            elif lname == "batchnorm":
                # "0"/""/"false" mean off, matching BPT_DISABLE_CONV_REWRITES
                bn_cls = (nn.BatchNorm
                          if os.environ.get("BPT_FLAX_BN", "").lower()
                          not in ("", "0", "false")
                          else BatchNorm)
                x = bn_cls(use_running_average=not train,
                           momentum=0.9, epsilon=1e-5,
                           dtype=self.dtype)(x)
            elif lname == "relu":
                x = nn.relu(x)
            elif lname == "leaky relu":
                x = nn.leaky_relu(x, negative_slope=config if config is not None else 0.2)
            elif lname == "prelu":
                # torch PReLU: single learnable slope, init 0.25
                x = PReLU()(x)
            elif lname == "tanh":
                x = jnp.tanh(x)
            elif lname == "sigmoid":
                x = nn.sigmoid(x)
            elif lname == "softplus":
                x = nn.softplus(x)
            elif lname == "residual block":
                inner, act = config
                slopes = (_canonical_res_block_slopes(config)
                          if self.fused_res_blocks and not self.spectral_norm
                          else None)
                if slopes is not None:
                    x = FusedResBlock(inner[0][1]["out_channels"],
                                      dtype=self.dtype,
                                      inner_slope=slopes[0],
                                      outer_slope=slopes[1])(x, train=train)
                else:
                    x = ResidualBlock(tuple(map(tuple, inner)), tuple(act),
                                      dtype=self.dtype,
                                      spectral_norm=self.spectral_norm)(x, train=train)
            elif lname == "upsample nearest":
                s = config["scale"]
                n, h, w, c = x.shape
                x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                     (n, h, s, w, s, c)
                                     ).reshape(n, h * s, w * s, c)
            elif lname == "flatten":
                x = x.reshape(x.shape[0], -1)
            elif lname == "unflatten":
                # config is channel-first (C, ...); heads split channels
                # explicitly in the models, so this is a no-op marker kept for
                # spec compatibility (see CVAE._split_heads).
                pass
            else:
                raise NotImplementedError(f"Layer {name} not supported yet!")
        return x


def merge_aux_label(y, aux_label):
    """Concatenate scalar labels as constant feature maps (NHWC).

    models/utils.py:159-182 equivalent: y (N,H,W,C), aux (N,) or (N,K)
    -> (N,H,W,C+K).
    """
    aux_label = jnp.asarray(aux_label)
    if aux_label.ndim == 0:
        aux_label = aux_label.reshape(1, 1)
    elif aux_label.ndim == 1:
        aux_label = aux_label.reshape(-1, 1)
    if aux_label.shape[0] != y.shape[0]:
        raise ValueError("aux_label batch size needs to match that of y")
    n, h, w = y.shape[0], y.shape[1], y.shape[2]
    aux = jnp.broadcast_to(aux_label[:, None, None, :],
                           (n, h, w, aux_label.shape[-1])).astype(y.dtype)
    return jnp.concatenate([y, aux], axis=-1)
