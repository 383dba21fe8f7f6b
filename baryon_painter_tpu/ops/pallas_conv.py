"""Pallas TPU kernel: fused residual block (conv3x3+BN+ReLU, conv3x3+BN,
residual add, ReLU) for inference.

The CVAE/CGAN decoders run 4-9 residual blocks of 3x3 convs at 128 channels
(models/dsl.py res_block; trained_models/README.md:88-93). XLA executes each
conv as a separate HBM round trip; this kernel keeps the whole block's
activations in VMEM: the input tile is read once, both convs run as 9
shifted (H*W, C) x (C, C) MXU matmuls each, batch-norm (eval mode, folded to
scale/bias) and activations fuse in-register, and the output is written once.

Inference-only (painting path): batch-norm uses running statistics, no
gradients. Equality with the XLA fallback is tested in
tests/test_pallas_ops.py; use ``fold_bn`` to fold BN parameters.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["res_block_infer", "res_block_infer_xla", "fold_bn"]


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Fold eval-mode batch norm into a per-channel (scale', bias')."""
    s = scale / jnp.sqrt(var + eps)
    return s, bias - mean * s


def _conv3x3_mxu(x, w):
    """3x3 same-padding conv of (H, W, C) with (3, 3, C, C) weights as nine
    shifted MXU matmuls, f32 accumulation."""
    h, wdt, c = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((h * wdt, w.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xp[dy:dy + h, dx:dx + wdt, :].reshape(h * wdt, c)
            acc += jax.lax.dot_general(
                patch, w[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.reshape(h, wdt, w.shape[-1])


def _leaky(h, slope: float):
    """(Leaky) ReLU with a compile-time slope; 0.0 is plain ReLU. Uses a
    select (not max(h, slope*h), which is wrong for slope >= 1) so any
    slope matches nn.leaky_relu exactly."""
    if slope == 0.0:
        return jnp.maximum(h, 0.0)
    return jnp.where(h >= 0, h, slope * h)


def _res_block_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                      out_ref, *, inner_slope: float, outer_slope: float):
    x = x_ref[0]
    h = _conv3x3_mxu(x, w1_ref[:])
    h = _leaky(h * s1_ref[:] + b1_ref[:], inner_slope)
    h = _conv3x3_mxu(h.astype(x.dtype), w2_ref[:])
    h = h * s2_ref[:] + b2_ref[:]
    out_ref[0] = _leaky(h + x.astype(jnp.float32),
                        outer_slope).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "inner_slope",
                                             "outer_slope"))
def res_block_infer(x, w1, scale1, bias1, w2, scale2, bias2,
                    interpret: bool = False, inner_slope: float = 0.0,
                    outer_slope: float = 0.0):
    """Fused inference residual block.

    x: (N, H, W, C) NHWC; w1/w2: (3, 3, C, C); scale/bias: (C,) folded BN
    (see fold_bn). Returns act(x + bn2(conv2(act(bn1(conv1(x)))))) where act
    is (leaky) ReLU with the given compile-time slopes — 0.0 (default) is
    the CVAE's plain-ReLU block, 0.2 the CGAN generator's LeakyReLU block
    (trained_models/README.md:97).
    """
    n, h, wdt, c = x.shape
    f32 = jnp.float32
    args = (x, w1.astype(x.dtype), scale1.astype(f32), bias1.astype(f32),
            w2.astype(x.dtype), scale2.astype(f32), bias2.astype(f32))
    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_res_block_kernel, inner_slope=inner_slope,
                          outer_slope=outer_slope),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def res_block_infer_xla(x, w1, scale1, bias1, w2, scale2, bias2,
                        inner_slope: float = 0.0, outer_slope: float = 0.0):
    """XLA reference implementation (used as fallback and in tests)."""
    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v, w.astype(v.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    h = _leaky(conv(x, w1) * scale1 + bias1, inner_slope)
    h = conv(h.astype(x.dtype), w2) * scale2 + bias2
    return _leaky(h + x.astype(jnp.float32), outer_slope).astype(x.dtype)
