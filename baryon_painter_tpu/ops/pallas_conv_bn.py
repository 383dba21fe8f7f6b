"""Pallas TPU kernel: fused TRAIN-MODE (transp-)conv + BatchNorm + ReLU.

Targets the two dominant byte carriers of the 512^2 decoder
(docs/ab/pnet_breakdown_r4.json): the transposed-conv up chain (35.9% of
fwd+bwd bytes) and the full-resolution input conv (20.0%). Both lower to
the same algebra (ops/conv_rewrites.py): a stride-1 VALID 3x3 conv on a
coarse grid with phase-expanded channels —
  * transp conv k=2s, p=s/2:  x is the coarse map itself (P = s^2 phases)
  * stride-1 fine conv via space-to-depth radix r (P = r^2 phases).

The kernels work entirely in the coarse phase-major channel domain; the
space-to-depth / depth-to-space boundary permutations are single XLA
copies in the wrapper (Mosaic's vector layouts cannot fuse the lane-dim
reshape in-kernel — measured: "unsupported shape cast" — and one aligned
copy per boundary tensor is a small fraction of the round trips saved).
Per (sample) grid program, HBM then sees:

  fwd:  read x twice (stats pass + output pass), write y once
  bwd:  read x twice + dy twice (BN-reduction pass + dx/dw pass),
        write dx once (+ tiny per-sample dw2/stat partials)

Batch-norm train statistics are a cross-sample reduction, so the forward
is two-phase: a stats kernel emits per-sample (sum, sum of squares) per
FINE channel (phases folded by aligned lane-slice sums), XLA combines
them into batch mean/var and the folded affine (a, b), and the output
kernel recomputes the conv (flops are free at 48 flops/byte vs the 241
ridge, docs/roofline.md) and writes relu(u*a + b). The custom VJP
implements the exact full BatchNorm backward (gradients through the
batch statistics included) with the same recompute strategy.

The primitive consumes the PRE-TRANSFORMED 3-window kernel w2; callers
pull gradients back to the logical (k, k, Cin, Cout) kernel through the
(differentiable, linear) weight transform. Numerics: matmuls accumulate
f32; stats/normalize arithmetic is f32 (flax semantics: fast variance,
biased batch var); y is cast to x.dtype. Equality + grad tests:
tests/test_pallas_conv_bn.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from baryon_painter_tpu.ops.conv_rewrites import (_depth_to_space,
                                                  _space_to_depth)
from baryon_painter_tpu.ops.pallas_head_stack import (STRIP, _nine_mm_rows,
                                                      _pad1)

__all__ = ["fused_conv_bn_relu"]


def _phase_sum(u, n_phase, c):
    """Sum (M1, M2, P*C) over the P phase groups -> (M1, M2, C); aligned
    lane-dim slices (channel layout is phase-major)."""
    acc = u[:, :, :c]
    for p in range(1, n_phase):
        acc = acc + u[:, :, p * c:(p + 1) * c]
    return acc


def _tile_phases(vec, p):
    """(C,) per-fine-channel vector -> (P*C,) phase-major channel layout.
    Applied in the XLA wrapper (Mosaic cannot lower the 1-D concat)."""
    return jnp.tile(vec, p)


def _strips(hc):
    return [(r0, min(STRIP, hc - r0)) for r0 in range(0, hc, STRIP)]


def _stats_kernel(x_ref, w2_ref, s1_ref, s2_ref, *, n_phase):
    """Strip-mined: per-strip live memory is one (STRIP*Wc, P*C) f32 conv
    strip — a full-plane f32 u at the biggest up-chain shapes costs
    ~17 MB each across several temporaries and blows Mosaic's scoped
    VMEM accounting (measured 123-245 MB of 128)."""
    i = pl.program_id(0)
    xp = _pad1(x_ref[0])
    hc = xp.shape[0] - 2
    c = w2_ref.shape[-1] // n_phase
    s1 = jnp.zeros((c,), jnp.float32)
    s2 = jnp.zeros((c,), jnp.float32)
    for r0, sh in _strips(hc):
        u = _nine_mm_rows(xp, w2_ref[:], r0, sh)
        s1 = s1 + _phase_sum(u, n_phase, c).sum((0, 1))
        s2 = s2 + _phase_sum(u * u, n_phase, c).sum((0, 1))
    # s1/s2 are whole-(N, C) VMEM blocks (Mosaic's block rule forbids a
    # (1, C) row block when N isn't 8-aligned); each program writes row i
    s1_ref[i] = s1
    s2_ref[i] = s2


def _fwd_kernel(x_ref, w2_ref, a_ref, b_ref, y_ref, *, n_phase):
    x = x_ref[0]
    xp = _pad1(x)
    hc = xp.shape[0] - 2
    for r0, sh in _strips(hc):
        u = _nine_mm_rows(xp, w2_ref[:], r0, sh)
        y_ref[0, r0:r0 + sh] = jnp.maximum(
            u * a_ref[:] + b_ref[:], 0.0).astype(x.dtype)


def _bwd1_kernel(x_ref, w2_ref, a_ref, b_ref, mean_ref, inv_ref, dy_ref,
                 g1_ref, g2_ref, *, n_phase):
    """Per-sample BN-backward reductions: g1 = sum(dv), g2 = sum(dv*uhat)
    per fine channel, where dv = relu'(v) * dy. Strip-mined."""
    i = pl.program_id(0)
    xp = _pad1(x_ref[0])
    hc = xp.shape[0] - 2
    c = w2_ref.shape[-1] // n_phase
    g1 = jnp.zeros((c,), jnp.float32)
    g2 = jnp.zeros((c,), jnp.float32)
    for r0, sh in _strips(hc):
        u = _nine_mm_rows(xp, w2_ref[:], r0, sh)
        v = u * a_ref[:] + b_ref[:]
        g = dy_ref[0, r0:r0 + sh].astype(jnp.float32)
        dv = jnp.where(v > 0, g, 0.0)
        uhat = (u - mean_ref[:]) * inv_ref[:]
        g1 = g1 + _phase_sum(dv, n_phase, c).sum((0, 1))
        g2 = g2 + _phase_sum(dv * uhat, n_phase, c).sum((0, 1))
    g1_ref[i] = g1
    g2_ref[i] = g2


def _bwd2_kernel(x_ref, w2_ref, w2b_ref, a_ref, b_ref, mean_ref, inv_ref,
                 s1n_ref, s2n_ref, dy_ref, dx_ref, dw2_ref, *, n_phase):
    """Strip-mined dx/dw pass. For the dx rows of one strip, du is
    recomputed with a one-row halo (du outside the plane is zero — the
    forward pads with zeros); dw accumulates from each strip's interior
    du rows. No full-plane f32 temporary is ever live."""
    x = x_ref[0]
    dtype = x.dtype
    xsp = _pad1(x)
    hc, wc = xsp.shape[0] - 2, xsp.shape[1] - 2
    ci = xsp.shape[2]
    co = w2_ref.shape[-1]

    def du_rows(r0, sh):
        # du rows [r0, r0+sh) clipped to the plane; zero outside
        lo = max(r0, 0)
        hi = min(r0 + sh, hc)
        u = _nine_mm_rows(xsp, w2_ref[:], lo, hi - lo)
        v = u * a_ref[:] + b_ref[:]
        g = dy_ref[0, lo:hi].astype(jnp.float32)
        dv = jnp.where(v > 0, g, 0.0)
        uhat = (u - mean_ref[:]) * inv_ref[:]
        du = a_ref[:] * (dv - s1n_ref[:] - uhat * s2n_ref[:])
        pad_top = lo - r0
        pad_bot = (r0 + sh) - hi
        if pad_top or pad_bot:
            du = jnp.pad(du, ((pad_top, pad_bot), (0, 0), (0, 0)))
        return du

    # nine (ci, co) f32 accumulators in a Python 3x3 list — a
    # dw_acc.at[dy, dx].add(...) would lower to a scatter-add, which
    # Mosaic cannot compile (the _wgrad_mm pattern, kept strip-local here
    # because dx and dw share the recomputed du strips)
    dw_acc = [[jnp.zeros((ci, co), jnp.float32) for _ in range(3)]
              for _ in range(3)]
    for r0, sh in _strips(hc):
        du_ext = du_rows(r0 - 1, sh + 2).astype(dtype)  # 1-row halo
        # dx strip: VALID 3x3 conv of the column-padded halo'd du strip
        du_p = jnp.pad(du_ext, ((0, 0), (1, 1), (0, 0)))
        dx_ref[0, r0:r0 + sh] = _nine_mm_rows(
            jnp.pad(du_p, ((1, 1), (0, 0), (0, 0))), w2b_ref[:], 1, sh
        ).astype(jnp.float32)
        # dw from this strip's interior du rows against the input patches
        du_mid = du_ext[1:-1].reshape(sh * wc, co)
        for dy in range(3):
            for dx in range(3):
                patch = xsp[r0 + dy:r0 + dy + sh,
                            dx:dx + wc, :].reshape(sh * wc, ci)
                dw_acc[dy][dx] = dw_acc[dy][dx] + jax.lax.dot_general(
                    patch, du_mid, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    dw2_ref[0] = jnp.stack([jnp.stack(row) for row in dw_acc])


def _vmem(n_bytes=127 * 1024 * 1024):
    return pltpu.CompilerParams(vmem_limit_bytes=n_bytes)


def _bspec(shape, index, space=pltpu.VMEM):
    return pl.BlockSpec(shape, index, memory_space=space)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_conv_bn_relu(x, w2, gamma, beta, in_radix: int, out_radix: int,
                       eps: float = 1e-5, interpret: bool = False):
    """relu(bn_train(conv3window(x, w2))), depth-to-spaced to the fine grid.

    x: (N, H, W, Cin) — the coarse map (transp-conv case, in_radix=0) or
    the fine map (stride-1 s2d case, in_radix=r; the wrapper pays one
    space-to-depth copy). w2: (3, 3, Ci', P*C) pre-transformed 3-window
    kernel (phase-major output channels). gamma/beta: (C,) BN parameters
    over FINE channels. Returns (y, batch_mean, batch_var): y is the
    fine-grid output; mean/var are f32 (C,) for the caller's running-stat
    update (their cotangents must be zero — feed them only through
    stop_gradient).
    """
    y, mean, var, _ = _fused_fwd_impl(x, w2, gamma, beta, in_radix,
                                      out_radix, eps, interpret)
    return y, mean, var


def _counts(xs, out_radix, w2):
    n, hc, wc, _ = xs.shape
    pc = w2.shape[-1]
    n_phase = out_radix * out_radix
    c = pc // n_phase
    n_count = n * hc * wc * n_phase  # samples per fine channel
    return hc, wc, n_phase, c, n_count


def _fused_fwd_impl(x, w2, gamma, beta, in_radix, out_radix, eps, interpret):
    xs = _space_to_depth(x, in_radix) if in_radix else x
    n = xs.shape[0]
    hc, wc, n_phase, c, n_count = _counts(xs, out_radix, w2)
    kern = functools.partial(_stats_kernel, n_phase=n_phase)
    s1, s2 = pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[_bspec((1,) + xs.shape[1:], lambda i: (i, 0, 0, 0)),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2),
        out_shape=[jax.ShapeDtypeStruct((n, c), jnp.float32)] * 2,
        compiler_params=_vmem(), interpret=interpret)(xs, w2)
    mean = s1.sum(0) / n_count
    var = s2.sum(0) / n_count - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    a = gamma * inv
    b = beta - mean * a
    fwd = functools.partial(_fwd_kernel, n_phase=n_phase)
    yc = pl.pallas_call(
        fwd,
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[_bspec((1,) + xs.shape[1:], lambda i: (i, 0, 0, 0)),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=_bspec((1, hc, wc, n_phase * c),
                             lambda i: (i, 0, 0, 0))),
        out_shape=jax.ShapeDtypeStruct((n, hc, wc, n_phase * c), x.dtype),
        compiler_params=_vmem(), interpret=interpret)(
            xs, w2, _tile_phases(a, n_phase).astype(jnp.float32),
            _tile_phases(b, n_phase).astype(jnp.float32))
    y = _depth_to_space(yc, out_radix)
    return y, mean, var, (xs, a, b, inv)


def _fused_vjp_fwd(x, w2, gamma, beta, in_radix, out_radix, eps, interpret):
    y, mean, var, (xs, a, b, inv) = _fused_fwd_impl(
        x, w2, gamma, beta, in_radix, out_radix, eps, interpret)
    return (y, mean, var), (xs, w2, mean, inv, a, b)


def _fused_vjp_bwd(in_radix, out_radix, eps, interpret, res, cts):
    dy, _, _ = cts  # mean/var feed only stop_gradient'ed running stats
    xs, w2, mean, inv, a, b = res
    n = xs.shape[0]
    hc, wc, n_phase, c, n_count = _counts(xs, out_radix, w2)
    dt = xs.dtype
    dyc = _space_to_depth(dy.astype(dt), out_radix)
    f32 = jnp.float32

    bwd1 = functools.partial(_bwd1_kernel, n_phase=n_phase)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    g1, g2 = pl.pallas_call(
        bwd1,
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[_bspec((1,) + xs.shape[1:], lambda i: (i, 0, 0, 0)),
                      vec, vec, vec, vec, vec,
                      _bspec((1, hc, wc, n_phase * c),
                             lambda i: (i, 0, 0, 0))],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2),
        out_shape=[jax.ShapeDtypeStruct((n, c), f32)] * 2,
        compiler_params=_vmem(), interpret=interpret)(
            xs, w2, _tile_phases(a, n_phase).astype(f32),
            _tile_phases(b, n_phase).astype(f32),
            _tile_phases(mean, n_phase).astype(f32),
            _tile_phases(inv, n_phase).astype(f32), dyc)
    S1 = g1.sum(0)
    S2 = g2.sum(0)
    dgamma = S2.astype(jnp.float32)
    dbeta = S1.astype(jnp.float32)
    s1n = S1 / n_count
    s2n = S2 / n_count

    w2b = jnp.flip(w2, axis=(0, 1)).transpose(0, 1, 3, 2)
    bwd2 = functools.partial(_bwd2_kernel, n_phase=n_phase)
    dxs, dw2 = pl.pallas_call(
        bwd2,
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[_bspec((1,) + xs.shape[1:], lambda i: (i, 0, 0, 0)),
                      vec, vec, vec, vec, vec, vec, vec, vec,
                      _bspec((1, hc, wc, n_phase * c),
                             lambda i: (i, 0, 0, 0))],
            out_specs=[
                _bspec((1,) + xs.shape[1:], lambda i: (i, 0, 0, 0)),
                _bspec((1,) + w2.shape, lambda i: (i, 0, 0, 0, 0))]),
        out_shape=[jax.ShapeDtypeStruct(xs.shape, f32),
                   jax.ShapeDtypeStruct((n,) + w2.shape, f32)],
        compiler_params=_vmem(), interpret=interpret)(
            xs, w2, w2b, _tile_phases(a, n_phase).astype(f32),
            _tile_phases(b, n_phase).astype(f32),
            _tile_phases(mean, n_phase).astype(f32),
            _tile_phases(inv, n_phase).astype(f32),
            _tile_phases(s1n, n_phase).astype(f32),
            _tile_phases(s2n, n_phase).astype(f32), dyc)
    # adjoint of the wrapper's space-to-depth is depth-to-space (a pure
    # permutation)
    dx = _depth_to_space(dxs, in_radix) if in_radix else dxs
    return dx.astype(dt), dw2.sum(0).astype(w2.dtype), dgamma, dbeta


fused_conv_bn_relu.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)
