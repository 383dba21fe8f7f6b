"""B-spline resampling (scipy.ndimage.zoom equivalent) in pure JAX.

The reference leans on ``scipy.ndimage.zoom`` with spline orders 3 and 5 and
modes 'mirror'/'reflect' (process_SLICS.py:64,167,205; create_lightcone.py:122).
``jax.image.resize`` uses different kernels (Keys cubic, not B-splines), so we
implement the real thing: inverse-B-spline prefiltering with exact
infinite-extension boundary initialisation (truncated-FIR by default, exact
FFT deconvolution as the regression reference — scipy's sequential
causal/anticausal recursion is a terrible TPU fit), then separable B-spline
evaluation with scipy's grid_mode=False coordinate mapping. Everything is
jit-able; the prefilter dominates the SLICS zoom cost, so it must be fast as
well as *correct* for the y-map fidelity.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["zoom", "resize_spline", "spline_filter_1d"]

# Poles of the B-spline prefilter (Unser et al. 1993; scipy ni_splines.c).
_POLES = {
    0: (),
    1: (),
    2: (math.sqrt(8.0) - 3.0,),
    3: (math.sqrt(3.0) - 2.0,),
    4: (math.sqrt(664.0 - math.sqrt(438976.0)) + math.sqrt(304.0) - 19.0,
        math.sqrt(664.0 + math.sqrt(438976.0)) - math.sqrt(304.0) - 19.0),
    5: (math.sqrt(135.0 / 2.0 - math.sqrt(17745.0 / 4.0))
        + math.sqrt(105.0 / 4.0) - 13.0 / 2.0,
        math.sqrt(135.0 / 2.0 + math.sqrt(17745.0 / 4.0))
        - math.sqrt(105.0 / 4.0) - 13.0 / 2.0),
}


def _extend(x, mode):
    """Extend the last axis into one full period of the boundary mode."""
    if mode == "mirror":  # period 2N-2: [x0..xN-1, xN-2..x1]
        return jnp.concatenate([x, x[..., -2:0:-1]], axis=-1)
    if mode == "reflect":  # period 2N: [x0..xN-1, xN-1..x0]
        return jnp.concatenate([x, x[..., ::-1]], axis=-1)
    if mode == "wrap":  # genuinely periodic: period N is the signal itself
        return x
    raise ValueError(f"mode '{mode}' not supported "
                     "(use 'mirror', 'reflect' or 'wrap').")


# Discrete B-spline kernels b[k] = B_order(k) (the values the prefilter must
# deconvolve; e.g. cubic: B3(-1,0,1) = 1/6, 4/6, 1/6).
_BSPLINE_TAPS = {
    2: np.array([1.0, 6.0, 1.0]) / 8.0,
    3: np.array([1.0, 4.0, 1.0]) / 6.0,
    4: np.array([1.0, 76.0, 230.0, 76.0, 1.0]) / 384.0,
    5: np.array([1.0, 26.0, 66.0, 26.0, 1.0]) / 120.0,
}


# Half-width of the truncated inverse-B-spline FIR (per order). The inverse
# filter 1/B(z) has impulse response sums of |pole|^|k| terms; the slowest
# pole sets the decay. K is chosen so |pole_max|^(K+1) < 1e-9 — truncation
# error below f32 roundoff of the exact (FFT) deconvolution.
_FIR_HALF_WIDTH = {2: 12, 3: 16, 4: 22, 5: 26}


@functools.lru_cache(maxsize=None)
def _fir_inverse_taps(order: int) -> np.ndarray:
    """Truncated impulse response of the inverse B-spline filter 1/B(z).

    Computed numerically as the circular deconvolution kernel on a period
    far longer than the decay length (the poles decay geometrically, so
    h[|k|>K] is below 1e-9 of h[0] for the K table above).
    """
    P = 1 << 13
    taps = _BSPLINE_TAPS[order]
    r = len(taps) // 2
    kernel = np.zeros(P)
    for k in range(-r, r + 1):
        kernel[k % P] += taps[k + r]
    h = np.fft.irfft(1.0 / np.fft.rfft(kernel))
    K = _FIR_HALF_WIDTH[order]
    out = h[np.arange(-K, K + 1) % P]
    assert abs(h[K + 1]) < 1e-8 * abs(out[K]), "FIR half-width too small"
    return out


def _spline_filter_fir(x, order: int, mode: str):
    """Truncated-FIR inverse-spline filtering along the LAST axis.

    Pads the signal by K samples of its mirror/reflect periodic extension
    (a static gather), then runs one VALID 1-D convolution with the
    symmetric truncated inverse kernel — identical to the circular
    deconvolution up to |pole|^(K+1) ~ 1e-9. Unlike the FFT route this
    needs no complex intermediates and no Bluestein factors for awkward
    lengths (a 7053^2 SLICS native tile spends ~all its zoom time in the
    length-14104 rfft; the FIR is a 33-53 tap conv).
    """
    n = x.shape[-1]
    if n == 1:
        return x  # the periodic extension is constant; B(z) sums to 1
    K = _FIR_HALF_WIDTH[order]
    h = jnp.asarray(_fir_inverse_taps(order), jnp.float32)
    # static host-side index map (the jnp _map_indices would stage under jit)
    raw = np.arange(-K, n + K)
    if mode == "mirror":
        p = 2 * n - 2
        m = np.abs(raw) % p
        idx = np.minimum(m, p - m)
    elif mode == "reflect":
        p = 2 * n
        m = raw % p
        idx = np.where(m < n, m, p - 1 - m)
    elif mode == "wrap":
        idx = raw % n
    else:
        raise ValueError(
            f"mode '{mode}' not supported "
            "(use 'mirror', 'reflect' or 'wrap').")
    xp = x.astype(jnp.float32)[..., idx]
    lead = xp.shape[:-1]
    flat = xp.reshape((-1, 1, n + 2 * K))
    # Precision.HIGHEST: on TPU a default-precision f32 conv is a single
    # bf16 MXU pass — ~0.8% error on the prefiltered plane (measured),
    # visible against the exact FFT path. The taps are few; genuine f32
    # accumulation costs nothing measurable here.
    out = jax.lax.conv_general_dilated(
        flat, h.reshape(1, 1, 2 * K + 1), window_strides=(1,),
        padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    return out.reshape(lead + (n,)).astype(x.dtype)


def spline_filter_1d(x, order: int, mode: str = "mirror", axis: int = -1,
                     impl: str = "auto"):
    """B-spline prefilter along one axis (scipy.ndimage.spline_filter1d).

    The mirror/reflect extension of the signal is PERIODIC (period 2N-2 or
    2N), and the infinite-extension prefilter on a periodic signal is exactly
    a circular deconvolution by the sampled B-spline kernel — which matches
    scipy's boundary handling exactly because scipy's boundary initialisation
    IS the infinite/periodic extension steady state. (The sequential
    causal/anticausal recursion scipy runs is a terrible fit for TPUs —
    thousands of tiny scan steps.)

    ``impl`` selects how the deconvolution is computed:
      * ``"fir"`` (and ``"auto"``): truncated-FIR convolution — see
        ``_spline_filter_fir``; error vs exact < 1e-9 relative, no complex
        intermediates, no awkward-length FFTs.
      * ``"fft"``: exact circular deconvolution
        ``irfft(rfft(extend(x)) / rfft(b, P))[:N]`` — the regression
        reference for the FIR path.
    """
    if order < 2:
        return x
    x = jnp.moveaxis(x, axis, -1)
    if impl in ("auto", "fir"):
        return jnp.moveaxis(_spline_filter_fir(x, order, mode), -1, axis)
    if impl != "fft":
        raise ValueError(f"impl {impl!r} (use 'auto', 'fir' or 'fft')")
    n = x.shape[-1]
    xt = _extend(x, mode)
    p = xt.shape[-1]
    taps = _BSPLINE_TAPS[order]
    r = len(taps) // 2
    kernel = np.zeros(p)
    for k in range(-r, r + 1):
        kernel[k % p] += taps[k + r]
    denom = jnp.asarray(np.fft.rfft(kernel).real, dtype=jnp.float32)
    ft = jnp.fft.rfft(xt.astype(jnp.float32), axis=-1)
    out = jnp.fft.irfft(ft / denom, n=p, axis=-1)[..., :n]
    return jnp.moveaxis(out.astype(x.dtype), -1, axis)


def _bspline_weights(t, order: int):
    """B-spline kernel values at offsets; t in [0,1) is the fractional part.

    Returns weights of shape t.shape + (order+1,) for taps
    floor(x) - (order-1)//2 + arange(order+1).
    """
    if order == 0:
        return jnp.ones(t.shape + (1,), t.dtype)
    if order == 1:
        return jnp.stack([1 - t, t], axis=-1)
    if order == 3:
        # taps at distances: t+1, t, 1-t, 2-t
        t2, t3 = t * t, t * t * t
        w0 = (1 - t) ** 3 / 6.0
        w1 = (3 * t3 - 6 * t2 + 4) / 6.0
        w2 = (-3 * t3 + 3 * t2 + 3 * t + 1) / 6.0
        w3 = t3 / 6.0
        return jnp.stack([w0, w1, w2, w3], axis=-1)
    if order == 5:
        # quintic B-spline B5 evaluated at |x| in [0,3)
        def b5(u):
            au = jnp.abs(u)
            au2, au3, au4, au5 = au ** 2, au ** 3, au ** 4, au ** 5
            # piecewise from Unser: B5(x) for |x|<1:
            f1 = 11.0 / 20.0 - au2 / 2.0 + au4 / 4.0 - au5 / 12.0
            f2 = (17.0 / 40.0 + 5.0 * au / 8.0 - 7.0 * au2 / 4.0 + 5.0 * au3 / 4.0
                  - 3.0 * au4 / 8.0 + au5 / 24.0)
            f3 = (3.0 - au) ** 5 / 120.0
            return jnp.where(au < 1, f1, jnp.where(au < 2, f2,
                             jnp.where(au < 3, f3, 0.0)))
        offs = jnp.arange(-2, 4, dtype=t.dtype)  # taps floor-2 .. floor+3
        return b5(t[..., None] - offs)
    raise NotImplementedError(f"order {order}")


def _map_indices(idx, n: int, mode: str):
    if mode == "mirror":
        p = 2 * n - 2 if n > 1 else 1
        m = jnp.abs(idx) % p
        return jnp.minimum(m, p - m)
    if mode == "reflect":
        p = 2 * n
        m = idx % p
        m = jnp.where(m < 0, m + p, m)
        return jnp.where(m < n, m, p - 1 - m)
    if mode == "wrap":
        return idx % n  # jnp % is non-negative for n > 0
    raise ValueError(mode)


def _resample_axis(c, out_n: int, order: int, mode: str, axis: int):
    """Evaluate the spline (coefficients c) at zoom coordinates along axis."""
    c = jnp.moveaxis(c, axis, -1)
    n = c.shape[-1]
    # Coordinates are static — compute them host-side in FLOAT64 like scipy
    # does: f32 coordinate roundoff flips nearest-neighbour picks (an f32
    # product can land exactly on .5 where the f64 value is just below) and
    # skews spline fractions near exact knots.
    if mode == "wrap":
        # periodic resampling: cell-centered map, scipy's grid_mode=True
        # ('grid-wrap'): in = (out + 0.5) * n/out_n - 0.5. The period maps
        # exactly, so there is no edge clamp and indices wrap.
        coords64 = ((np.arange(out_n, dtype=np.float64) + 0.5)
                    * (n / out_n) - 0.5)
        base64 = np.floor(coords64).astype(np.int64)
    else:
        if out_n > 1 and n > 1:
            scale = (n - 1) / (out_n - 1)
        else:
            scale = 0.0
        coords64 = np.arange(out_n, dtype=np.float64) * scale
        base64 = np.floor(coords64).astype(np.int64)
        # keep base such that frac in [0,1); at the exact right edge clamp
        if order >= 1:
            base64 = np.clip(base64, 0, max(n - 2, 0))
    base = jnp.asarray(base64, jnp.int32)
    t = jnp.asarray(coords64 - base64, c.dtype)
    w = _bspline_weights(t, order)  # (out_n, taps)
    taps = w.shape[-1]
    first = -((order - 1) // 2) if order >= 1 else 0
    if order == 0:
        # scipy's nearest is floor(x + 0.5) in double precision; both
        # jnp.round (half-to-even) and f32 coords diverge from it
        idx = jnp.asarray(np.floor(coords64 + 0.5).astype(np.int64),
                          jnp.int32)[:, None]
    else:
        idx = base[:, None] + (first + jnp.arange(taps))[None, :]
    idx = _map_indices(idx, n, mode)
    gathered = c[..., idx]  # (..., out_n, taps)
    return jnp.moveaxis(jnp.einsum("...ot,ot->...o", gathered, w), -1, axis)


@functools.partial(jax.jit, static_argnames=("out_shape", "order", "mode",
                                             "prefilter", "prefilter_impl"))
def resize_spline(x, out_shape, order: int = 3, mode: str = "mirror",
                  prefilter: bool = True, prefilter_impl: str = "auto"):
    """Resample the last two axes of ``x`` to ``out_shape`` (H, W).

    Matches scipy.ndimage.zoom semantics with grid_mode=False: output
    coordinate o maps to input coordinate o*(in-1)/(out-1).
    """
    if order not in (0, 1, 3, 5):
        raise NotImplementedError(f"order {order} (supported: 0, 1, 3, 5)")
    out_h, out_w = out_shape
    c = x
    if prefilter and order >= 2:
        c = spline_filter_1d(c, order, mode, axis=-1, impl=prefilter_impl)
        c = spline_filter_1d(c, order, mode, axis=-2, impl=prefilter_impl)
    c = _resample_axis(c, out_w, order, mode, axis=-1)
    c = _resample_axis(c, out_h, order, mode, axis=-2)
    return c


def zoom(x, zoom_factor, order: int = 3, mode: str = "mirror"):
    """scipy.ndimage.zoom equivalent over the last two axes."""
    h, w = x.shape[-2], x.shape[-1]
    if np.isscalar(zoom_factor):
        zf = (float(zoom_factor), float(zoom_factor))
    else:
        zf = tuple(float(z) for z in zoom_factor)
    out_shape = (int(round(h * zf[0])), int(round(w * zf[1])))
    return resize_spline(x, out_shape, order=order, mode=mode)
