"""MXU-shaped rewrites of the model's pathological convolutions.

The fiducial CVAE (models/cvae.py:262) spends most of its FLOP budget in
convolutions that map terribly onto the 128x128 MXU:

  * ``ConvTranspose2d`` (k=2s, the DSL's scale-2/4 upsamplers): XLA computes
    these via ``lhs_dilation``, so (s^2-1)/s^2 of the multiplies hit
    interleaved zeros - 75% waste at s=2, 94% at s=4.
  * stride-1 convs at 512^2 with few channels (the p_y_z_out heads: 16->8 k7,
    8->1 k5): with C_out < 128 the MXU computes 128 output lanes regardless,
    so a C_out=8 conv wastes 94% of the array.

Both are fixed here by *exact* reindexing - the logical parameters and the
function computed are bit-for-bit the same math, only the loop order changes:

  * ``transp_conv_as_conv``: y = d2s(conv(pad(x), W')) where W' scatters the
    (k, k, Cin, Cout) kernel into a (3, 3, Cin, s*s*Cout) one. A dense
    stride-1 conv with s^2 x more output channels: no dilation zeros, and the
    output-channel dimension fills the MXU.
  * ``conv_via_space_to_depth``: y = d2s(conv(s2d(x, r), W'')) with
    W'': (3, 3, r*r*Cin, r*r*Cout). Contraction and output dims both grow by
    r^2 = 16, turning a 6%-utilization conv into a full-width matmul.

Derivation sketch (1-D, transposed conv, PyTorch convention out =
(in-1)s - 2p + k): with o = s*q + rho and lhs-pad = k-1-p, the taps of
out[o] are x[q+d] * w[s*d - rho + (k-1-p)] for d such that the kernel index
lands in [0, k). For k = 2s, p = s/2 (the DSL's scale map, models/dsl.py)
every phase rho only touches d in {-1, 0, 1}, i.e. a 3-wide window over q.
The space-to-depth case is the same algebra with x[r*q + u] as cell/phase.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["transp_conv_as_conv", "conv_via_space_to_depth",
           "transp_conv_rewrite_applicable", "s2d_rewrite_applicable"]


def _clipped_gather_idx(offsets: np.ndarray, k: int) -> np.ndarray:
    """Map out-of-range kernel indices to the zero row appended at index k."""
    return np.where((offsets >= 0) & (offsets < k), offsets, k)


def transp_conv_rewrite_applicable(k: int, s: int, p: int,
                                   output_padding: int) -> bool:
    """The 3-window form needs every phase's taps within cells {-1,0,1}.
    No tap at d<=-2 requires pad = k-1-p < 2s (worst phase rho=0); none at
    d>=2 requires 2s + pad >= k at rho=s-1, i.e. p <= s. Covers the DSL's
    (4,2,1) and (8,4,2)."""
    return (s > 1 and output_padding == 0 and 0 < k - p <= 2 * s
            and 0 <= p <= s)


def _transp_kernel_3window(w, s: int, p: int):
    """(k, k, Cin, Cout) -> (3, 3, Cin, s*s*Cout), output channels ordered
    (phase_h, phase_w, cout) to match the depth-to-space reshape below."""
    k = w.shape[0]
    pad = k - 1 - p
    # idx[dh, rho] = kernel row hit by window offset d=dh-1 at output phase rho
    idx = np.array([[s * (dh - 1) - rho + pad for rho in range(s)]
                    for dh in range(3)])
    idx = _clipped_gather_idx(idx, k)
    wz = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    t = wz[idx]          # (3, s, k+1, Cin, Cout)
    t = t[:, :, idx]     # (3, s, 3, s, Cin, Cout)
    t = t.transpose(0, 2, 4, 1, 3, 5)          # (3, 3, Cin, s, s, Cout)
    return t.reshape(3, 3, w.shape[2], s * s * w.shape[3])


def _depth_to_space(y, r: int):
    n, h, w, c = y.shape
    c_out = c // (r * r)
    y = y.reshape(n, h, w, r, r, c_out)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h * r, w * r, c_out)


def _space_to_depth(x, r: int):
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // r, w // r, r * r * c)


def transp_conv_as_conv(x, w, s: int, p: int):
    """Exact ConvTranspose2d(k, s, p) as stride-1 conv + depth-to-space.

    x: (N, H, W, Cin), w: (k, k, Cin, Cout) ->  (N, H*s, W*s, Cout)
    (requires transp_conv_rewrite_applicable; out size (H-1)s - 2p + k = H*s
    exactly when k - 2p = s, true for the DSL's scale map).
    """
    w2 = _transp_kernel_3window(w, s, p)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, w2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _depth_to_space(y, s)


def s2d_rewrite_applicable(k: int, s: int, p: int, h: int, w: int,
                           cin: int, r: int = 4) -> bool:
    """Profitable + expressible-as-3-window: stride-1 same-padding odd
    kernel, spatial dims divisible by r, few enough channels that the MXU
    is padding-bound, and the taps of every phase within cells {-1,0,1}:
    no tap at d>=2 needs r + 1 + p >= k (worst u=0, rho=r-1); none at d<=-2
    needs p <= r (worst u=r-1, rho=0)."""
    return (s == 1 and p == (k - 1) // 2 and k % 2 == 1
            and h % r == 0 and w % r == 0 and h >= 32 * r
            and cin * k * k <= 1024
            and k - p <= r + 1 and p <= r)


def s2d_rewrite_profitable(k: int, cin: int, cout: int, r: int = 4) -> bool:
    """Compare MXU tile-op counts (128-wide K and N padding) per output
    pixel of the FINE grid: direct = ceil(k^2 cin/128) * ceil(cout/128);
    s2d = ceil(9 r^2 cin/128) * ceil(r^2 cout/128) / r^2."""
    tiles = lambda n: -(-n // 128)
    direct = tiles(k * k * cin) * tiles(cout)
    s2d = tiles(9 * r * r * cin) * tiles(r * r * cout) / (r * r)
    return s2d < 0.75 * direct  # require a real margin, not a wash


def _s2d_kernel_3window(w, r: int, p: int):
    """(k, k, Cin, Cout) -> (3, 3, r*r*Cin, r*r*Cout).

    Input channels ordered (u_h, u_w, cin) to match space-to-depth; output
    channels (rho_h, rho_w, cout) to match depth-to-space.
    """
    k, _, cin, cout = w.shape
    # idx[dh, u, rho] = kernel row for window offset d=dh-1, intra-cell row u,
    # output phase rho:  a = r*d + u - rho + p
    idx = np.array([[[r * (dh - 1) + u - rho + p for rho in range(r)]
                     for u in range(r)] for dh in range(3)])
    idx = _clipped_gather_idx(idx, k)
    wz = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    t = wz[idx]              # (3, uh, rh, k+1, Cin, Cout) - rows gathered
    t = t[:, :, :, idx]      # (3, uh, rh, 3, uw, rw, Cin, Cout) - cols
    t = t.transpose(0, 3, 1, 4, 6, 2, 5, 7)  # (3, 3, uh, uw, Cin, rh, rw, Cout)
    return t.reshape(3, 3, r * r * cin, r * r * cout)


def conv_via_space_to_depth(x, w, p: int, r: int = 4):
    """Exact stride-1 'same' conv computed on the r-times-coarser
    space-to-depth grid. x: (N, H, W, Cin), w: (k, k, Cin, Cout)."""
    w2 = _s2d_kernel_3window(w, r, p)
    xs = _space_to_depth(x, r)
    xs = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xs, w2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _depth_to_space(y, r)
