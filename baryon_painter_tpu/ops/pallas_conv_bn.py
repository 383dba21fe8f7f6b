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
  bwd:  read x twice + dy twice (BN-reduction pass + du/dw pass),
        write dx once (+ tiny per-sample dw2/stat partials)

Strip execution model (round 5): each program stages its zero-padded
plane in a VMEM scratch ref once, then runs a ``lax.fori_loop`` over
32-row strips with dynamic ``pl.ds`` reads. The round-4 version unrolled
the strip loop in Python, and at the two largest production shapes
(trunk-in s2d 512^2, up3 transp 256^2x32) Mosaic's register allocator
needed 219 MB of spill slots and the remote compile died — measured; the
two smaller up-chain kernels (<=4 unrolled strips) compiled fine. A real
loop bounds the program size regardless of plane height. Ragged tails
(hc % 32 != 0) run as one statically-shaped extra strip after the loop.
Mosaic cannot lower ``dynamic_slice`` on *values*, so all dynamic reads
go through refs (inputs or scratch) — that is why the padded plane lives
in scratch rather than as a ``jnp.pad`` value.

Batch-norm train statistics are a cross-sample reduction, so the forward
is two-phase: a stats kernel emits per-sample (sum, sum of squares) per
FINE channel (phases folded by aligned lane-slice sums), XLA combines
them into batch mean/var and the folded affine (a, b), and the output
kernel recomputes the conv (flops are free at 48 flops/byte vs the 241
ridge, docs/roofline.md) and writes relu(u*a + b). The custom VJP
implements the exact full BatchNorm backward (gradients through the
batch statistics included) with the same recompute strategy; its du/dw
pass stages the padded du plane in a second scratch so the dx pass is a
plain strip conv with no halo branching, and accumulates the nine
(ci, co) dw partials in a Python 3x3 list (a ``.at[dy, dx].add`` would
lower to a scatter-add Mosaic cannot compile).

The primitive consumes the PRE-TRANSFORMED 3-window kernel w2; callers
pull gradients back to the logical (k, k, Cin, Cout) kernel through the
(differentiable, linear) weight transform. Numerics: matmuls accumulate
f32; stats/normalize arithmetic is f32 (flax semantics: fast variance,
biased batch var); y is cast to x.dtype. Equality + grad tests:
tests/test_pallas_conv_bn.py.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from baryon_painter_tpu.ops.conv_rewrites import (_depth_to_space,
                                                  _space_to_depth)
from baryon_painter_tpu.ops.pallas_head_stack import STRIP

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


def _stage_pad1(x, xp_ref):
    """Stage the zero-padded plane of x into scratch (H+2, W+2, C)."""
    xp_ref[:] = jnp.zeros_like(xp_ref)
    xp_ref[1:x.shape[0] + 1, 1:x.shape[1] + 1, :] = x


def _foreach_strip(hc, body, carry):
    """carry = body(r0, sh, carry) over 32-row strips of the coarse grid.

    Full strips run inside one ``fori_loop`` (bounded program size — see
    module docstring); a ragged tail runs as one extra static call."""
    n_full = hc // STRIP
    tail = hc % STRIP
    if n_full:
        carry = jax.lax.fori_loop(
            0, n_full, lambda j, c: body(j * STRIP, STRIP, c), carry)
    if tail:
        carry = body(n_full * STRIP, tail, carry)
    return carry


def _nine_mm_strip(xp_ref, w2, r0, sh):
    """Rows [r0, r0+sh) of the VALID 3x3 conv of the ref-staged padded
    plane (Hc+2, Wc+2, Ci) with (3, 3, Ci, Co) weights; f32 accumulation.
    ``r0`` may be traced (dynamic ``pl.ds`` ref reads)."""
    wc = xp_ref.shape[1] - 2
    ci, co = xp_ref.shape[2], w2.shape[-1]
    acc = jnp.zeros((sh * wc, co), jnp.float32)
    for dy in range(3):
        rows = xp_ref[pl.ds(r0 + dy, sh), :, :]
        for dx in range(3):
            patch = rows[:, dx:dx + wc, :].reshape(sh * wc, ci)
            acc += jax.lax.dot_general(
                patch, w2[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.reshape(sh, wc, co)


def _stats_kernel(x_ref, w2_ref, s1_ref, s2_ref, xp_ref, *, n_phase):
    i = pl.program_id(0)
    x = x_ref[0]
    hc = x.shape[0]
    c = w2_ref.shape[-1] // n_phase
    _stage_pad1(x, xp_ref)
    w2 = w2_ref[:]

    def body(r0, sh, carry):
        s1, s2 = carry
        u = _nine_mm_strip(xp_ref, w2, r0, sh)
        s1 = s1 + _phase_sum(u, n_phase, c).sum((0, 1))
        s2 = s2 + _phase_sum(u * u, n_phase, c).sum((0, 1))
        return s1, s2

    s1, s2 = _foreach_strip(hc, body, (jnp.zeros((c,), jnp.float32),
                                       jnp.zeros((c,), jnp.float32)))
    # s1/s2 are whole-(N, C) VMEM blocks (Mosaic's block rule forbids a
    # (1, C) row block when N isn't 8-aligned); each program writes row i
    s1_ref[i] = s1
    s2_ref[i] = s2


def _fwd_kernel(x_ref, w2_ref, a_ref, b_ref, y_ref, xp_ref, *, n_phase):
    x = x_ref[0]
    hc = x.shape[0]
    _stage_pad1(x, xp_ref)
    w2 = w2_ref[:]
    a = a_ref[:]
    b = b_ref[:]

    def body(r0, sh, carry):
        u = _nine_mm_strip(xp_ref, w2, r0, sh)
        y_ref[0, pl.ds(r0, sh)] = jnp.maximum(
            u * a + b, 0.0).astype(x.dtype)
        return carry

    _foreach_strip(hc, body, 0)


def _bwd1_kernel(x_ref, w2_ref, a_ref, b_ref, mean_ref, inv_ref, dy_ref,
                 g1_ref, g2_ref, xp_ref, *, n_phase):
    """Per-sample BN-backward reductions: g1 = sum(dv), g2 = sum(dv*uhat)
    per fine channel, where dv = relu'(v) * dy."""
    i = pl.program_id(0)
    x = x_ref[0]
    hc = x.shape[0]
    c = w2_ref.shape[-1] // n_phase
    _stage_pad1(x, xp_ref)
    w2 = w2_ref[:]
    a = a_ref[:]
    b = b_ref[:]
    mean = mean_ref[:]
    inv = inv_ref[:]

    def body(r0, sh, carry):
        g1, g2 = carry
        u = _nine_mm_strip(xp_ref, w2, r0, sh)
        v = u * a + b
        g = dy_ref[0, pl.ds(r0, sh)].astype(jnp.float32)
        dv = jnp.where(v > 0, g, 0.0)
        uhat = (u - mean) * inv
        g1 = g1 + _phase_sum(dv, n_phase, c).sum((0, 1))
        g2 = g2 + _phase_sum(dv * uhat, n_phase, c).sum((0, 1))
        return g1, g2

    g1, g2 = _foreach_strip(hc, body, (jnp.zeros((c,), jnp.float32),
                                       jnp.zeros((c,), jnp.float32)))
    g1_ref[i] = g1
    g2_ref[i] = g2


def _bwd2_body(xp_ref, dup_ref, dy_read, dx_write, w2_ref, w2b_ref, a_ref,
               b_ref, mean_ref, inv_ref, s1n_ref, s2n_ref, dw2_ref, dtype,
               n_phase):
    """du/dw then dx, three strip passes over ref-staged planes.

    Pass 1 recomputes each strip's pre-BN conv, forms du (the exact
    full-BN cotangent of the conv output) and stages it into the padded
    du scratch. Pass 2 accumulates the nine (ci, co) dw partials from the
    staged du (splitting passes 1/2 keeps each fori_loop body at 9
    matmuls — one fused body spilled ~100 MB of vregs on TPU). Pass 3
    reads the du plane back as a plain VALID 3x3 strip conv with the
    flipped/transposed kernel — no halo recompute or row masking needed
    because the scratch's zero border IS the boundary condition.

    ``dy_read(r0, sh)`` / ``dx_write(r0, sh, strip)`` abstract where the
    cotangent planes live (blocked VMEM windows in the current variant;
    shapes whose windows cannot fit VMEM use the XLA fallback instead —
    see ``_bwd_xla``)."""
    hc = xp_ref.shape[0] - 2
    wc = xp_ref.shape[1] - 2
    ci = xp_ref.shape[2]
    co = w2_ref.shape[-1]
    dup_ref[:] = jnp.zeros_like(dup_ref)
    w2 = w2_ref[:]
    a = a_ref[:]
    b = b_ref[:]
    mean = mean_ref[:]
    inv = inv_ref[:]
    s1n = s1n_ref[:]
    s2n = s2n_ref[:]

    def body_du(r0, sh, carry):
        u = _nine_mm_strip(xp_ref, w2, r0, sh)
        v = u * a + b
        g = dy_read(r0, sh).astype(jnp.float32)
        dv = jnp.where(v > 0, g, 0.0)
        uhat = (u - mean) * inv
        # du in the compute dtype (the unfused graph's inter-layer
        # cotangents are bf16 too)
        du = (a * (dv - s1n - uhat * s2n)).astype(dtype)
        dup_ref[pl.ds(r0 + 1, sh), 1:wc + 1, :] = du
        return carry

    _foreach_strip(hc, body_du, 0)

    def body_dw(r0, sh, dw):
        # du strip read back from scratch: splitting the du and dw loops
        # keeps each fori_loop body at 9 matmuls — one fused body (18
        # matmuls + the BN algebra) spilled ~100 MB of vregs on TPU
        du_flat = dup_ref[pl.ds(r0 + 1, sh), 1:wc + 1, :].reshape(
            sh * wc, co)
        out = []
        for dy in range(3):
            rows = xp_ref[pl.ds(r0 + dy, sh), :, :]
            for dx in range(3):
                patch = rows[:, dx:dx + wc, :].reshape(sh * wc, ci)
                out.append(dw[len(out)] + jax.lax.dot_general(
                    patch, du_flat, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        return out

    # nine (ci, co) f32 accumulators in a Python list — an
    # .at[dy, dx].add on a (3, 3, ci, co) array would lower to a
    # scatter-add, which Mosaic cannot compile
    dw = _foreach_strip(hc, body_dw,
                        [jnp.zeros((ci, co), jnp.float32)] * 9)
    dw2_ref[0] = jnp.stack([jnp.stack(dw[3 * r:3 * r + 3])
                            for r in range(3)])

    w2b = w2b_ref[:]

    def body_dx(r0, sh, carry):
        dx_write(r0, sh,
                 _nine_mm_strip(dup_ref, w2b, r0, sh).astype(dtype))
        return carry

    _foreach_strip(hc, body_dx, 0)


def _bwd2_kernel(x_ref, w2_ref, w2b_ref, a_ref, b_ref, mean_ref, inv_ref,
                 s1n_ref, s2n_ref, dy_ref, dx_ref, dw2_ref, xp_ref, dup_ref,
                 *, n_phase):
    """Blocked-window variant: x/dy/dx are per-sample VMEM windows."""
    x = x_ref[0]
    _stage_pad1(x, xp_ref)

    def dy_read(r0, sh):
        return dy_ref[0, pl.ds(r0, sh)]

    def dx_write(r0, sh, strip):
        dx_ref[0, pl.ds(r0, sh)] = strip

    _bwd2_body(xp_ref, dup_ref, dy_read, dx_write, w2_ref, w2b_ref, a_ref,
               b_ref, mean_ref, inv_ref, s1n_ref, s2n_ref, dw2_ref,
               x.dtype, n_phase)


def _bwd_xla(xs, w2, mean, inv, a, b, dyc, n_phase, c, n_count, dt):
    """Plain-XLA backward — the exact same math as the Pallas bwd pair.

    Used when the blocked-window bwd2 kernel cannot fit VMEM: at e.g. the
    up3 production shape (coarse 256^2, ci=32, pc=64) the full-plane
    windows are lane-padded to 128 channels and double-buffered (measured
    170.8 of 128 MB), and a manual-DMA rewrite dies in a Mosaic
    ``memref_slice`` limitation on lane-padded HBM memrefs. The fused
    FORWARD still runs as Pallas kernels (and keeps its HBM savings);
    only this layer's backward falls back to XLA ops — which is what the
    fully-unfused graph would have paid anyway."""
    f32 = jnp.float32
    at = _tile_phases(a, n_phase).astype(f32)
    bt = _tile_phases(b, n_phase).astype(f32)
    mt = _tile_phases(mean, n_phase).astype(f32)
    it = _tile_phases(inv, n_phase).astype(f32)
    dn = ("NHWC", "HWIO", "NHWC")
    u = jax.lax.conv_general_dilated(
        xs, w2, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=f32)
    v = u * at + bt
    dv = jnp.where(v > 0, dyc.astype(f32), 0.0)
    uhat = (u - mt) * it
    pc = w2.shape[-1]

    def fold(t):  # (pc,) phase-major sums -> (c,)
        return t.reshape(n_phase, c).sum(0)

    S1 = fold(dv.sum((0, 1, 2)))
    S2 = fold((dv * uhat).sum((0, 1, 2)))
    s1n = _tile_phases(S1 / n_count, n_phase)
    s2n = _tile_phases(S2 / n_count, n_phase)
    du = (at * (dv - s1n - uhat * s2n)).astype(dt)
    w2b = jnp.flip(w2, axis=(0, 1)).transpose(0, 1, 3, 2)
    dxs = jax.lax.conv_general_dilated(
        du, w2b, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=f32).astype(dt)
    # dw2[ky, kx] = <x patch, du> — nine shifted contractions over (n,h,w)
    n, hc, wc, ci = xs.shape
    xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw2 = jnp.stack([
        jnp.stack([
            jax.lax.dot_general(
                xp[:, dy:dy + hc, dx:dx + wc, :].reshape(-1, ci),
                du.reshape(-1, pc),
                (((0,), (0,)), ((), ())), preferred_element_type=f32)
            for dx in range(3)])
        for dy in range(3)])
    return dxs, dw2, S1.astype(f32), S2.astype(f32)


def _pad_lane(c):
    """Channels occupy lane multiples of 128 in VMEM regardless of count."""
    return -(-c // 128) * 128


def _bwd2_windows_fit(hc, wc, ci, pc, isz):
    """Would the blocked-window bwd2 variant fit 128 MB VMEM?

    Accounts for lane padding and double buffering of the three
    full-plane windows (dx out, x in, dy in) plus the two scratch planes,
    with a ~24 MB margin for register spills, weights and sublane slop
    (measured: up3 needs ~10 MB of spills)."""
    # dx out + x in are ci-wide, dy in is pc-wide; each double-buffered
    win = 2 * hc * wc * (2 * _pad_lane(ci) + _pad_lane(pc)) * isz
    scr = (hc + 2) * (wc + 2) * (_pad_lane(ci) + _pad_lane(pc)) * isz
    margin = 24 * 1024 * 1024
    return win + scr + margin <= 127 * 1024 * 1024


def _vmem(n_bytes=127 * 1024 * 1024, serial=False):
    """serial=True forces 'arbitrary' grid semantics: Mosaic then single-
    buffers the per-sample windows — the bwd2 kernel's full-plane in/out
    windows (x, dy, dx, dup) double-buffered cost ~40 MB over budget."""
    if serial:
        return pltpu.CompilerParams(vmem_limit_bytes=n_bytes,
                                    dimension_semantics=("arbitrary",))
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
    ci = xs.shape[-1]
    pad_plane = pltpu.VMEM((hc + 2, wc + 2, ci), xs.dtype)
    kern = functools.partial(_stats_kernel, n_phase=n_phase)
    s1, s2 = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[_bspec((1,) + xs.shape[1:], lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, c), jnp.float32)] * 2,
        scratch_shapes=[pad_plane],
        compiler_params=_vmem(), interpret=interpret)(xs, w2)
    mean = s1.sum(0) / n_count
    var = s2.sum(0) / n_count - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    a = gamma * inv
    b = beta - mean * a
    fwd = functools.partial(_fwd_kernel, n_phase=n_phase)
    yc = pl.pallas_call(
        fwd,
        grid=(n,),
        in_specs=[_bspec((1,) + xs.shape[1:], lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=_bspec((1, hc, wc, n_phase * c),
                         lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hc, wc, n_phase * c), x.dtype),
        scratch_shapes=[pad_plane],
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
    ci = xs.shape[-1]
    dt = xs.dtype
    dyc = _space_to_depth(dy.astype(dt), out_radix)
    f32 = jnp.float32
    pad_plane = pltpu.VMEM((hc + 2, wc + 2, ci), dt)

    # BPT_CONV_BN_BWD2=windows|xla overrides the fit heuristic (tests
    # exercise the XLA fallback at small shapes with it)
    force = os.environ.get("BPT_CONV_BN_BWD2", "")
    use_windows = force == "windows" or (force != "xla" and _bwd2_windows_fit(
        hc, wc, ci, n_phase * c, np.dtype(dt).itemsize))
    if not use_windows:
        dxs, dw2s, S1, S2 = _bwd_xla(xs, w2, mean, inv, a, b, dyc,
                                     n_phase, c, n_count, dt)
        dx = _depth_to_space(dxs, in_radix) if in_radix else dxs
        return (dx.astype(dt), dw2s.astype(w2.dtype),
                S2.astype(f32), S1.astype(f32))

    bwd1 = functools.partial(_bwd1_kernel, n_phase=n_phase)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    g1, g2 = pl.pallas_call(
        bwd1,
        grid=(n,),
        in_specs=[_bspec((1,) + xs.shape[1:], lambda i: (i, 0, 0, 0)),
                  vec, vec, vec, vec, vec,
                  _bspec((1, hc, wc, n_phase * c),
                         lambda i: (i, 0, 0, 0))],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, c), f32)] * 2,
        scratch_shapes=[pad_plane],
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
    operands = (xs, w2, w2b, _tile_phases(a, n_phase).astype(f32),
                _tile_phases(b, n_phase).astype(f32),
                _tile_phases(mean, n_phase).astype(f32),
                _tile_phases(inv, n_phase).astype(f32),
                _tile_phases(s1n, n_phase).astype(f32),
                _tile_phases(s2n, n_phase).astype(f32), dyc)
    dup_scr = pltpu.VMEM((hc + 2, wc + 2, n_phase * c), dt)
    dw2_spec = _bspec((1,) + w2.shape, lambda i: (i, 0, 0, 0, 0))
    out_shape = [jax.ShapeDtypeStruct(xs.shape, dt),
                 jax.ShapeDtypeStruct((n,) + w2.shape, f32)]
    bwd2 = functools.partial(_bwd2_kernel, n_phase=n_phase)
    dxs, dw2 = pl.pallas_call(
        bwd2,
        grid=(n,),
        in_specs=[_bspec((1,) + xs.shape[1:], lambda i: (i, 0, 0, 0)),
                  vec, vec, vec, vec, vec, vec, vec, vec,
                  _bspec((1, hc, wc, n_phase * c),
                         lambda i: (i, 0, 0, 0))],
        out_specs=[
            _bspec((1,) + xs.shape[1:], lambda i: (i, 0, 0, 0)),
            dw2_spec],
        out_shape=out_shape,
        scratch_shapes=[pad_plane, dup_scr],
        compiler_params=_vmem(serial=True), interpret=interpret)(
            *operands)
    # adjoint of the wrapper's space-to-depth is depth-to-space (a pure
    # permutation)
    dx = _depth_to_space(dxs, in_radix) if in_radix else dxs
    return dx.astype(dt), dw2.sum(0).astype(w2.dtype), dgamma, dbeta


fused_conv_bn_relu.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)
