"""Pallas TPU kernel: fused TRAIN-MODE (transp-)conv + BatchNorm + ReLU.

Targets the two dominant byte carriers of the 512^2 decoder
(docs/ab/pnet_breakdown_r4.json): the transposed-conv up chain (35.9% of
fwd+bwd bytes) and the full-resolution input conv (20.0%). Both lower to
the same algebra (ops/conv_rewrites.py): a stride-1 VALID 3x3 conv on a
coarse grid with phase-expanded channels, followed by depth-to-space —
  * transp conv k=2s, p=s/2:  x is the coarse map itself (P = s^2 phases)
  * stride-1 fine conv via space-to-depth radix r: x is s2d'd in-kernel
    (P = r^2 phases).

XLA materializes the conv output, the BN-stats reduction input, the
normalized tensor and the d2s copy as separate HBM round trips; here each
(sample) grid program holds everything in VMEM and HBM sees only:

  fwd:  read x twice (stats pass + output pass), write y once
  bwd:  read x twice + dy twice (BN-reduction pass + dx/dw pass),
        write dx once (+ tiny per-sample dw2/stat partials)

Batch-norm train statistics are a cross-sample reduction, so the forward
is two-phase: a stats kernel emits per-sample (sum, sum of squares) per
FINE channel (phases folded in-kernel), XLA combines them into batch
mean/var and the folded affine (a, b), and the output kernel recomputes
the conv (flops are free at 48 flops/byte vs the 241 ridge,
docs/roofline.md) and writes relu(u*a + b) depth-to-spaced. The custom
VJP implements the exact full BatchNorm backward (gradients through the
batch statistics included) with the same recompute strategy.

The primitive consumes the PRE-TRANSFORMED 3-window kernel w2; callers
pull gradients back to the logical (k, k, Cin, Cout) kernel via jax.vjp
of the (linear) weight transform, as ops/pallas_head_stack.py does.
Numerics: matmuls accumulate f32; stats/normalize arithmetic is f32 (the
flax/custom-BatchNorm semantics: fast variance, biased batch var);
y is cast to x.dtype. Equality + grad tests: tests/test_pallas_conv_bn.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from baryon_painter_tpu.ops.pallas_head_stack import (_d2s_hw, _nine_mm,
                                                      _pad1, _s2d_hw,
                                                      _wgrad_mm)

__all__ = ["fused_conv_bn_relu"]


def _maybe_s2d(x, in_radix):
    return _s2d_hw(x, in_radix) if in_radix else x


def _tile_phases(vec, p):
    """(C,) per-fine-channel vector -> (P*C,) phase-major channel layout."""
    return jnp.tile(vec, p)


def _u_conv(x, w2, in_radix):
    xs = _maybe_s2d(x, in_radix)
    return _nine_mm(_pad1(xs), w2)  # (Hc, Wc, P*C) f32


def _stats_kernel(x_ref, w2_ref, s1_ref, s2_ref, *, in_radix, n_phase):
    i = pl.program_id(0)
    u = _u_conv(x_ref[0], w2_ref[:], in_radix)
    hc, wc, pc = u.shape
    c = pc // n_phase
    ur = u.reshape(hc * wc, n_phase, c)
    # s1/s2 are whole-(N, C) VMEM blocks (Mosaic's block rule forbids a
    # (1, C) row block when N isn't 8-aligned); each program writes row i
    s1_ref[i] = ur.sum((0, 1))
    s2_ref[i] = (ur * ur).sum((0, 1))


def _fwd_kernel(x_ref, w2_ref, a_ref, b_ref, y_ref, *, in_radix, n_phase,
                out_radix):
    x = x_ref[0]
    u = _u_conv(x, w2_ref[:], in_radix)
    a = _tile_phases(a_ref[:], n_phase)
    b = _tile_phases(b_ref[:], n_phase)
    y = jnp.maximum(u * a + b, 0.0)
    y_ref[0] = _d2s_hw(y, out_radix).astype(x.dtype)


def _bwd1_kernel(x_ref, w2_ref, a_ref, b_ref, mean_ref, inv_ref, dy_ref,
                 g1_ref, g2_ref, *, in_radix, n_phase, out_radix):
    """Per-sample BN-backward reductions: g1 = sum(dv), g2 = sum(dv*uhat)
    per fine channel, where dv = relu'(v) * dy."""
    u = _u_conv(x_ref[0], w2_ref[:], in_radix)
    a = _tile_phases(a_ref[:], n_phase)
    b = _tile_phases(b_ref[:], n_phase)
    v = u * a + b
    g = _s2d_hw(dy_ref[0], out_radix).astype(jnp.float32)
    dv = jnp.where(v > 0, g, 0.0)
    uhat = (u - _tile_phases(mean_ref[:], n_phase)) \
        * _tile_phases(inv_ref[:], n_phase)
    hc, wc, pc = u.shape
    c = pc // n_phase
    i = pl.program_id(0)
    g1_ref[i] = dv.reshape(hc * wc, n_phase, c).sum((0, 1))
    g2_ref[i] = (dv * uhat).reshape(hc * wc, n_phase, c).sum((0, 1))


def _bwd2_kernel(x_ref, w2_ref, w2b_ref, a_ref, b_ref, mean_ref, inv_ref,
                 s1n_ref, s2n_ref, dy_ref, dx_ref, dw2_ref, *, in_radix,
                 n_phase, out_radix):
    x = x_ref[0]
    xs = _maybe_s2d(x, in_radix)
    xsp = _pad1(xs)
    u = _nine_mm(xsp, w2_ref[:])
    a = _tile_phases(a_ref[:], n_phase)
    b = _tile_phases(b_ref[:], n_phase)
    v = u * a + b
    g = _s2d_hw(dy_ref[0], out_radix).astype(jnp.float32)
    dv = jnp.where(v > 0, g, 0.0)
    uhat = (u - _tile_phases(mean_ref[:], n_phase)) \
        * _tile_phases(inv_ref[:], n_phase)
    du = a * (dv - _tile_phases(s1n_ref[:], n_phase)
              - uhat * _tile_phases(s2n_ref[:], n_phase))
    du_c = du.astype(x.dtype)
    dw2_ref[0] = _wgrad_mm(xsp, du_c)
    dxs = _nine_mm(_pad1(du_c), w2b_ref[:])
    if in_radix:
        dx_ref[0] = _d2s_hw(dxs, in_radix).astype(jnp.float32)
    else:
        dx_ref[0] = dxs


def _vmem(n_bytes=110 * 1024 * 1024):
    return pltpu.CompilerParams(vmem_limit_bytes=n_bytes)


def _bspec(shape, index, space=pltpu.VMEM):
    return pl.BlockSpec(shape, index, memory_space=space)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_conv_bn_relu(x, w2, gamma, beta, in_radix: int, out_radix: int,
                       eps: float = 1e-5, interpret: bool = False):
    """relu(bn_train(conv3window(x, w2))) with depth-to-space output.

    x: (N, H, W, Cin) — the coarse map (transp-conv case, in_radix=0) or
    the fine map (stride-1 s2d case, in_radix=r). w2: (3, 3, Ci', P*C)
    pre-transformed 3-window kernel (phase-major output channels).
    gamma/beta: (C,) BN parameters over FINE channels. Returns
    (y, batch_mean, batch_var): y is (N, H*out_radix/..., C) fine-grid;
    mean/var are f32 (C,) for the caller's running-stat update (their
    cotangents must be zero — feed them only through stop_gradient).
    """
    y, mean, var, _ = _fused_fwd_impl(x, w2, gamma, beta, in_radix,
                                      out_radix, eps, interpret)
    return y, mean, var


def _counts(x, in_radix, out_radix, w2):
    n, h, w, cin = x.shape
    hc = h // in_radix if in_radix else h
    wc = w // in_radix if in_radix else w
    pc = w2.shape[-1]
    n_phase = out_radix * out_radix
    c = pc // n_phase
    n_count = n * hc * wc * n_phase  # samples per fine channel
    return hc, wc, n_phase, c, n_count


def _fused_fwd_impl(x, w2, gamma, beta, in_radix, out_radix, eps, interpret):
    n = x.shape[0]
    hc, wc, n_phase, c, n_count = _counts(x, in_radix, out_radix, w2)
    kern = functools.partial(_stats_kernel, in_radix=in_radix,
                             n_phase=n_phase)
    s1, s2 = pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[_bspec((1,) + x.shape[1:], lambda i: (i, 0, 0, 0)),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2),
        out_shape=[jax.ShapeDtypeStruct((n, c), jnp.float32)] * 2,
        compiler_params=_vmem(), interpret=interpret)(x, w2)
    mean = s1.sum(0) / n_count
    var = s2.sum(0) / n_count - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    a = gamma * inv
    b = beta - mean * a
    fwd = functools.partial(_fwd_kernel, in_radix=in_radix, n_phase=n_phase,
                            out_radix=out_radix)
    hf, wf = hc * out_radix, wc * out_radix
    y = pl.pallas_call(
        fwd,
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[_bspec((1,) + x.shape[1:], lambda i: (i, 0, 0, 0)),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=_bspec((1, hf, wf, c), lambda i: (i, 0, 0, 0))),
        out_shape=jax.ShapeDtypeStruct((n, hf, wf, c), x.dtype),
        compiler_params=_vmem(), interpret=interpret)(
            x, w2, a.astype(jnp.float32), b.astype(jnp.float32))
    return y, mean, var, (a, b, inv)


def _fused_vjp_fwd(x, w2, gamma, beta, in_radix, out_radix, eps, interpret):
    y, mean, var, (a, b, inv) = _fused_fwd_impl(
        x, w2, gamma, beta, in_radix, out_radix, eps, interpret)
    return (y, mean, var), (x, w2, mean, inv, a, b)


def _fused_vjp_bwd(in_radix, out_radix, eps, interpret, res, cts):
    dy, _, _ = cts  # mean/var feed only stop_gradient'ed running stats
    x, w2, mean, inv, a, b = res
    n = x.shape[0]
    hc, wc, n_phase, c, n_count = _counts(x, in_radix, out_radix, w2)
    dt = x.dtype
    dy = dy.astype(dt)
    f32 = jnp.float32

    bwd1 = functools.partial(_bwd1_kernel, in_radix=in_radix,
                             n_phase=n_phase, out_radix=out_radix)
    hf, wf = hc * out_radix, wc * out_radix
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    g1, g2 = pl.pallas_call(
        bwd1,
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[_bspec((1,) + x.shape[1:], lambda i: (i, 0, 0, 0)),
                      vec, vec, vec, vec, vec,
                      _bspec((1, hf, wf, c), lambda i: (i, 0, 0, 0))],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2),
        out_shape=[jax.ShapeDtypeStruct((n, c), f32)] * 2,
        compiler_params=_vmem(), interpret=interpret)(
            x, w2, a.astype(f32), b.astype(f32), mean.astype(f32),
            inv.astype(f32), dy)
    S1 = g1.sum(0)
    S2 = g2.sum(0)
    dgamma = S2
    dbeta = S1
    s1n = S1 / n_count
    s2n = S2 / n_count

    w2b = jnp.flip(w2, axis=(0, 1)).transpose(0, 1, 3, 2)
    bwd2 = functools.partial(_bwd2_kernel, in_radix=in_radix,
                             n_phase=n_phase, out_radix=out_radix)
    dx, dw2 = pl.pallas_call(
        bwd2,
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[_bspec((1,) + x.shape[1:], lambda i: (i, 0, 0, 0)),
                      vec, vec, vec, vec, vec, vec, vec, vec,
                      _bspec((1, hf, wf, c), lambda i: (i, 0, 0, 0))],
            out_specs=[
                _bspec((1,) + x.shape[1:], lambda i: (i, 0, 0, 0)),
                _bspec((1,) + w2.shape, lambda i: (i, 0, 0, 0, 0))]),
        out_shape=[jax.ShapeDtypeStruct((n,) + x.shape[1:], f32),
                   jax.ShapeDtypeStruct((n,) + w2.shape, f32)],
        compiler_params=_vmem(), interpret=interpret)(
            x, w2, w2b, a.astype(f32), b.astype(f32), mean.astype(f32),
            inv.astype(f32), s1n.astype(f32), s2n.astype(f32), dy)
    dgamma = dgamma.astype(jnp.float32)
    dbeta = dbeta.astype(jnp.float32)
    return dx.astype(dt), dw2.sum(0).astype(w2.dtype), dgamma, dbeta


fused_conv_bn_relu.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)
