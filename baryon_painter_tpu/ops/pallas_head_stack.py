"""Pallas TPU kernel: fused TRAIN-MODE decoder output heads with custom VJP.

The fiducial decoder ends in three parallel heads, each
``conv k7 16->8 -> PReLU -> conv k5 8->1 -> PReLU -> conv k3 1->1`` at full
512^2 resolution (models/dsl.py; reference models/utils.py:130-157). Per
docs/ab/pnet_breakdown_r4.json these heads carry ~20% of the decoder's
fwd+bwd HBM bytes: XLA materializes every intermediate (plus the
space-to-depth/depth-to-space copies of ops/conv_rewrites.py) in HBM, so
the 201 MB head input is re-read and head intermediates re-written many
times per step.

This kernel runs ONE head chain per (sample, head) grid program entirely
in VMEM: the input tile is read once, the three convs run as 3x3-window
space-to-depth MXU matmuls (exactly the conv_rewrites algebra, but the
s2d/d2s reshapes happen in registers), and only the 1-channel output is
written. The custom VJP recomputes the chain in VMEM (flops are free on
this memory-bound step: docs/roofline.md) and emits dx / per-head dw2 /
dalpha partials; dw2 pulls back to the logical (k, k, Cin, Cout) kernels
through jax.vjp of the (linear) 3-window weight transform.

Numerics match the unfused path: matmuls accumulate f32 and cast back to
the input dtype before each PReLU (models/layers.py Conv2d emits
x.dtype; PReLU computes in x.dtype). The final softplus/identity of the
head spec stays outside (it fuses into the consumer). Equality and grad
tests: tests/test_pallas_head_stack.py (interpret mode, CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from baryon_painter_tpu.ops.conv_rewrites import _s2d_kernel_3window

__all__ = ["head_stack", "head_stack_xla"]

R = 4  # space-to-depth radix (the profitable choice per conv_rewrites A/B)


def _s2d_hw(x, r):
    """(H, W, C) -> (H/r, W/r, r*r*C) matching conv_rewrites._space_to_depth."""
    h, w, c = x.shape
    x = x.reshape(h // r, r, w // r, r, c)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(h // r, w // r, r * r * c)


def _d2s_hw(y, r):
    """(Hc, Wc, r*r*C) -> (Hc*r, Wc*r, C) inverse of _s2d_hw."""
    hc, wc, cr = y.shape
    c = cr // (r * r)
    y = y.reshape(hc, wc, r, r, c)
    y = y.transpose(0, 2, 1, 3, 4)
    return y.reshape(hc * r, wc * r, c)


def _pad1(x):
    return jnp.pad(x, ((1, 1), (1, 1), (0, 0)))


STRIP = 32  # coarse rows per in-kernel matmul strip: bounds Mosaic's
# scoped VMEM (nine full-size (M, Co) f32 dot products at 512^2 shapes
# cost ~150 MB of stack; strips cap the concurrent product size)


def _nine_mm_rows(xp, w2, r0, sh):
    """Rows [r0, r0+sh) of the VALID 3x3 conv of padded (Hc+2, Wc+2, Ci)
    input with (3, 3, Ci, Co) weights; f32 accumulation. The building
    block of strip-mined kernels: per-strip live memory is one
    (sh*Wc, Co) f32 accumulator."""
    wc = xp.shape[1] - 2
    ci, co = xp.shape[2], w2.shape[-1]
    acc = jnp.zeros((sh * wc, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xp[r0 + dy:r0 + dy + sh,
                       dx:dx + wc, :].reshape(sh * wc, ci)
            acc += jax.lax.dot_general(
                patch, w2[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.reshape(sh, wc, co)


def _nine_mm(xp, w2):
    """VALID 3x3 conv of padded (Hc+2, Wc+2, Ci) with (3, 3, Ci, Co) as nine
    shifted MXU matmuls; f32 accumulation, row-strip-mined. Returns
    (Hc, Wc, Co) f32."""
    hc = xp.shape[0] - 2
    rows = [_nine_mm_rows(xp, w2, r0, min(STRIP, hc - r0))
            for r0 in range(0, hc, STRIP)]
    return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)


def _wgrad_mm(xp, g):
    """dw2 of the VALID 3x3 conv: (3, 3, Ci, Co) f32 from padded input
    (Hc+2, Wc+2, Ci) and cotangent (Hc, Wc, Co); row-strip-mined."""
    hc, wc, co = g.shape
    ci = xp.shape[2]
    rows = []
    for dy in range(3):
        cols = []
        for dx in range(3):
            acc = jnp.zeros((ci, co), jnp.float32)
            for r0 in range(0, hc, STRIP):
                sh = min(STRIP, hc - r0)
                patch = xp[r0 + dy:r0 + dy + sh,
                           dx:dx + wc, :].reshape(sh * wc, ci)
                gs = g[r0:r0 + sh].reshape(sh * wc, co)
                acc += jax.lax.dot_general(
                    patch, gs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            cols.append(acc)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _prelu(u, alpha):
    return jnp.where(u >= 0, u, alpha.astype(u.dtype) * u)


def _chain_fwd(x_s2d, w1, w2, w3, a1, a2, dtype):
    """One head chain in s2d space; returns (u0, v0, u1, v1, u2) as f32
    (pre-act u*, activated v*). Comparisons/activations stay f32 — Mosaic
    has no bf16 compare ('Target does not support this comparison') — and
    only the next matmul's input is cast back to the compute dtype."""
    u0 = _nine_mm(_pad1(x_s2d), w1)
    v0 = _prelu(u0, a1)
    u1 = _nine_mm(_pad1(v0.astype(dtype)), w2)
    v1 = _prelu(u1, a2)
    u2 = _nine_mm(_pad1(v1.astype(dtype)), w3)
    return u0, v0, u1, v1, u2


def _fwd_kernel(xs_ref, w1_ref, w2_ref, w3_ref, al_ref, out_ref):
    h = pl.program_id(1)
    xs = xs_ref[0]  # pre-space-to-depth'd input (wrapper; Mosaic cannot
    # lower the lane-dim s2d reshape in-kernel)
    # al_ref is the whole (n_heads, 2) array (a (1, 2) row block violates
    # Mosaic's 8-aligned second-to-last block rule)
    _, _, _, _, u2 = _chain_fwd(xs, w1_ref[0], w2_ref[0], w3_ref[0],
                                al_ref[h, 0], al_ref[h, 1], xs.dtype)
    # coarse phase layout; d2s happens in the wrapper
    out_ref[0, 0] = u2.astype(xs.dtype)


def _bwd_kernel(xs_ref, dy_ref, w1_ref, w2_ref, w3_ref, b1_ref, b2_ref,
                b3_ref, al_ref, dx_ref, dw1_ref, dw2_ref, dw3_ref, dal_ref):
    i = pl.program_id(0)
    h = pl.program_id(1)
    xs = xs_ref[0]
    dtype = xs.dtype
    xsp = _pad1(xs)
    w1, w2, w3 = w1_ref[0], w2_ref[0], w3_ref[0]
    a1, a2 = al_ref[h, 0], al_ref[h, 1]
    u0, v0, u1, v1, _ = _chain_fwd(xs, w1, w2, w3, a1, a2, dtype)

    # cotangent of the head's output, already in coarse phase layout
    g2 = dy_ref[0, 0].astype(jnp.float32)

    # conv3 backward
    dw3_ref[0, 0] = _wgrad_mm(_pad1(v1.astype(dtype)), g2.astype(dtype))
    dv1 = _nine_mm(_pad1(g2.astype(dtype)), b3_ref[0])
    # prelu2 backward (u1 pre-act; alpha is a scalar)
    du1 = jnp.where(u1 >= 0, dv1, a2 * dv1)
    dal2 = jnp.sum(jnp.where(u1 < 0, dv1 * u1, 0.0))
    # conv2 backward
    dw2_ref[0, 0] = _wgrad_mm(_pad1(v0.astype(dtype)), du1.astype(dtype))
    dv0 = _nine_mm(_pad1(du1.astype(dtype)), b2_ref[0])
    du0 = jnp.where(u0 >= 0, dv0, a1 * dv0)
    dal1 = jnp.sum(jnp.where(u0 < 0, dv0 * u0, 0.0))
    # conv1 backward
    dw1_ref[0, 0] = _wgrad_mm(xsp, du0.astype(dtype))
    dxs = _nine_mm(_pad1(du0.astype(dtype)), b1_ref[0])
    dal_ref[i, h] = jnp.stack([dal1, dal2])  # whole-array block

    # dx accumulates across heads in the compute dtype (the unfused graph's
    # inter-layer cotangents are bf16 too); an f32 accumulator window
    # double-buffers to 2x16.8 MB and overflows the 128 MB VMEM budget
    dx_h = dxs.astype(dtype)  # coarse phase layout; d2s in the wrapper

    @pl.when(h == 0)
    def _init():
        dx_ref[0] = dx_h

    @pl.when(h > 0)
    def _acc():
        dx_ref[0] += dx_h


def _transform_weights(ws, pads):
    """Stack per-head logical kernels -> 3-window s2d kernels.

    ws: list over chain position of (n_heads, k, k, Cin, Cout) arrays.
    Returns list of (n_heads, 3, 3, r^2 Cin, r^2 Cout).
    """
    return [jnp.stack([_s2d_kernel_3window(w[h], R, p)
                       for h in range(w.shape[0])])
            for w, p in zip(ws, pads)]


def _flip_t(w2s):
    """Input-cotangent kernels: spatial flip + channel transpose."""
    return jnp.flip(w2s, axis=(1, 2)).transpose(0, 1, 2, 4, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def head_stack(x, w1, w2, w3, alphas, pads=(3, 2, 1), interpret=False):
    """Fused train-mode head stack.

    x: (N, H, W, Cin); w1: (n_heads, k1, k1, Cin, C1); w2: (n_heads, k2,
    k2, C1, 1); w3: (n_heads, k3, k3, 1, 1); alphas: (n_heads, 2) PReLU
    slopes (torch-style scalars); pads: per-conv same-paddings.

    Returns (N, n_heads, H, W): each head's final conv output (pre final
    activation — softplus/identity is applied by the caller).
    """
    y, _ = _head_stack_fwd(x, w1, w2, w3, alphas, pads, interpret)
    return y


def _head_stack_core(xs, tw1, tw2, tw3, alphas, interpret):
    n, hc, wc, cs = xs.shape
    nh = tw1.shape[0]
    c_out = tw3.shape[-1]
    grid_spec = pl.GridSpec(
        grid=(n, nh),
        in_specs=[
            pl.BlockSpec((1, hc, wc, cs), lambda i, h: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + tw1.shape[1:], lambda i, h: (h, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + tw2.shape[1:], lambda i, h: (h, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + tw3.shape[1:], lambda i, h: (h, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, hc, wc, c_out),
                               lambda i, h: (i, h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _fwd_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, nh, hc, wc, c_out), xs.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xs, tw1, tw2, tw3, alphas)


def _head_stack_fwd(x, w1, w2, w3, alphas, pads, interpret):
    from baryon_painter_tpu.ops.conv_rewrites import (_depth_to_space,
                                                      _space_to_depth)
    tw1, tw2, tw3 = _transform_weights([w1, w2, w3], pads)
    dt = x.dtype
    n, H, W, cin = x.shape
    nh = w1.shape[0]
    xs = _space_to_depth(x, R)
    yc = _head_stack_core(xs, tw1.astype(dt), tw2.astype(dt),
                          tw3.astype(dt), alphas.astype(jnp.float32),
                          interpret)
    y = _depth_to_space(yc.reshape(n * nh, H // R, W // R, R * R),
                        R).reshape(n, nh, H, W)
    return y, (x, w1, w2, w3, alphas)


def _head_stack_bwd(pads, interpret, res, dy):
    from baryon_painter_tpu.ops.conv_rewrites import (_depth_to_space,
                                                      _space_to_depth)
    x, w1, w2, w3, alphas = res
    n, H, W, cin = x.shape
    hc, wc = H // R, W // R
    nh = w1.shape[0]
    dt = x.dtype
    xs = _space_to_depth(x, R)
    dyc = _space_to_depth(
        dy.astype(dt).reshape(n * nh, H, W, 1), R).reshape(
            n, nh, hc, wc, R * R)

    def tf(ws):
        return _transform_weights(ws, pads)

    (tw1, tw2, tw3), pullback = jax.vjp(lambda a, b, c: tf([a, b, c]),
                                        w1, w2, w3)
    # the pullback's cotangents must match tf's output dtypes (= the
    # logical weights' dtype, e.g. bf16 under a low-precision caller)
    tw_dts = (tw1.dtype, tw2.dtype, tw3.dtype)
    tw1, tw2, tw3 = tw1.astype(dt), tw2.astype(dt), tw3.astype(dt)
    b1, b2, b3 = _flip_t(tw1), _flip_t(tw2), _flip_t(tw3)
    al = alphas.astype(jnp.float32)

    wspec = [pl.BlockSpec((1,) + t.shape[1:],
                          (lambda i, h: (h, 0, 0, 0, 0)),
                          memory_space=pltpu.VMEM)
             for t in (tw1, tw2, tw3, b1, b2, b3)]
    cs = xs.shape[-1]
    grid_spec = pl.GridSpec(
        grid=(n, nh),
        in_specs=[
            pl.BlockSpec((1, hc, wc, cs), lambda i, h: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hc, wc, R * R),
                         lambda i, h: (i, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *wspec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hc, wc, cs), lambda i, h: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + tw1.shape[1:],
                         lambda i, h: (i, h, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + tw2.shape[1:],
                         lambda i, h: (i, h, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + tw3.shape[1:],
                         lambda i, h: (i, h, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
    )
    dxs, dtw1, dtw2, dtw3, dal = pl.pallas_call(
        _bwd_kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, hc, wc, cs), dt),
            jax.ShapeDtypeStruct((n, nh) + tw1.shape[1:], jnp.float32),
            jax.ShapeDtypeStruct((n, nh) + tw2.shape[1:], jnp.float32),
            jax.ShapeDtypeStruct((n, nh) + tw3.shape[1:], jnp.float32),
            jax.ShapeDtypeStruct((n, nh, 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
            # serial grid: double-buffered windows overflow VMEM on the
            # backward (the per-program live set is already ~100 MB)
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xs, dyc, tw1, tw2, tw3, b1, b2, b3, al)
    # adjoint of the wrapper's space-to-depth is depth-to-space
    dx = _depth_to_space(dxs, R)
    dw1, dw2, dw3 = pullback([dtw1.sum(0).astype(tw_dts[0]),
                              dtw2.sum(0).astype(tw_dts[1]),
                              dtw3.sum(0).astype(tw_dts[2])])
    return (dx.astype(dt), dw1, dw2, dw3,
            dal.sum(0).astype(alphas.dtype))


head_stack.defvjp(_head_stack_fwd, _head_stack_bwd)


def head_stack_xla(x, w1, w2, w3, alphas, pads=(3, 2, 1)):
    """Unfused reference: plain lax convs + scalar PReLUs, same dtypes."""
    outs = []
    for h in range(w1.shape[0]):
        v = x
        for w, p, a in ((w1[h], pads[0], alphas[h, 0]),
                        (w2[h], pads[1], alphas[h, 1]),
                        (w3[h], pads[2], None)):
            v = jax.lax.conv_general_dilated(
                v, w.astype(v.dtype), (1, 1), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if a is not None:
                v = _prelu(v, a)
        outs.append(v[..., 0])
    return jnp.stack(outs, axis=1)
