"""Spatially-sharded, seam-free whole-plane painting (SP over ICI).

The reference paints large SLICS planes as overlapping 512-pixel tiles
blended with Gaussian weight maps (process_SLICS.py:196-220) because a
single-GPU PyTorch model only fits tile-sized inputs. The models are fully
convolutional, so on TPU we can do better: paint the WHOLE plane in one
pass, sharded spatially across the chips of a slice with halo exchange
over ICI — no tiles, no weight maps, no blending seams.

This is the "spatial sharding of conv layers via shard_map with halo
exchange" lever of SURVEY §5: instead of sharding every conv's inner loop,
we exploit that the total receptive field of the paint path is a few
hundred pixels and exchange that margin ONCE on the input plane. Each
device paints its row-slab extended by the receptive-field halo (fetched
from its ring neighbours with ``lax.ppermute``) and crops the halo off its
output. Interior results are bit-identical to an unsharded whole-plane
paint: convolution is local, so a slab that covers the receptive field of
every interior output computes exactly the same sums.

Latent consistency: the CVAE's prior sample z ~ N(mu, sigma) lives on the
/f latent grid (f = total downsample factor, 32 for the fiducial). To make
the sharded paint equal to the unsharded one, the noise eps is drawn ONCE
on the GLOBAL latent grid and every device slices its (halo-extended) part
— mu and sigma come from the local prior pass, which is interior-exact by
the same receptive-field argument.

Boundary semantics are periodic (the planes are slices of periodic boxes):
the row halos wrap via the ppermute ring, the column halos via wrap
padding. An unsharded reference path (``mesh=None``) applies identical
wrap padding so the two are comparable everywhere, not just in slab
interiors.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["spec_receptive_margin", "required_halo", "latent_downsample",
           "paint_plane", "calibrate_halo"]


# --------------------------------------------------------------------- #
# receptive-field accounting over the layer-spec DSL (models/dsl.py)
# --------------------------------------------------------------------- #

def spec_receptive_margin(spec, f: float = 1.0):
    """Upper-bound the one-sided receptive-field margin of a spec stack.

    Walks a ``SpecSequential`` layer-spec list tracking ``f``, the input-
    pixel footprint of one feature at the current layer's input, and
    accumulates each layer's one-sided reach in input pixels. A conv
    output at position ``o`` reads inputs ``[o*s - p, o*s - p + k - 1]``,
    so its one-sided reach is ``max(p, k - 1 - p)`` — NOT ``k // 2``: the
    DSL's scale-4 convs are even-kernel asymmetric (k=8, p=2, reach 5).

      * conv k, s, p:        margin += max(p, k-1-p) * f;        f *= s
      * transp conv k, s, p: margin += ceil(max(p, k-1-p)/s) * f; f /= s
      * upsample nearest s:  f /= s   (output reads floor(o/s): no reach)
      * residual block:      margin += margin(inner)  (stride-1)
      * batchnorm (eval) / activations: pointwise

    Returns ``(margin_in_input_pixels, f_out)``. The bound can still be
    loose in aggregate (padding truncation per layer); tests pin
    sufficiency by comparing paints at ``halo`` and ``2 * halo``, and
    :func:`calibrate_halo` measures the tight value per checkpoint.
    """
    margin = 0.0
    if spec is None:
        return margin, f
    for layer in spec:
        name = layer[0]
        lname = name.lower() if isinstance(name, str) else name
        config = layer[1] if len(layer) > 1 else None
        if lname == "conv":
            k = config["kernel_size"]
            s = config.get("stride", 1)
            p = config.get("padding", (k - 1) // 2)
            margin += max(p, k - 1 - p) * f
            f *= s
        elif lname == "transp conv":
            k = config["kernel_size"]
            s = config.get("stride", 1)
            p = config.get("padding", (k - 1) // 2)
            margin += math.ceil(max(p, k - 1 - p) / s) * f
            f /= s
        elif lname == "upsample nearest":
            f /= config["scale"]
        elif lname == "residual block":
            inner, _act = config
            m_in, f_in = spec_receptive_margin(inner, f)
            if f_in != f:
                raise ValueError("residual block inner spec changes "
                                 "resolution; cannot bound its halo")
            margin += m_in
        elif lname in ("batchnorm", "relu", "leaky relu", "prelu", "tanh",
                       "sigmoid", "softplus", "flatten", "unflatten"):
            # batchnorm is pointwise only with running stats (train=False);
            # paint_plane always runs the model in eval mode.
            pass
        elif lname == "linear":
            raise ValueError("spatial painting requires a fully "
                             "convolutional network; found a linear layer")
        else:
            raise ValueError(f"Unknown spec layer {name!r} in receptive-"
                             "field walk")
    return margin, f


def latent_downsample(architecture: dict) -> int:
    """Alignment granularity of the paint path.

    CVAE: the latent-grid factor (dim_y / dim_z spatial ratio, 32 for the
    fiducial); CGAN: the generator's internal downsample (4). Slab
    boundaries and halos must be multiples of this so strided convs tile
    identically in sharded and unsharded paints."""
    if "dim_z" in architecture:
        return int(architecture["dim_y"][1]) // int(architecture["dim_z"][1])
    return 4  # CGAN generator: two stride-2 downs


def required_halo(architecture: dict, model_kind: str = "cvae") -> int:
    """One-sided input halo (pixels) for seam-free painting, rounded up to
    the alignment granularity of :func:`latent_downsample`."""
    if model_kind == "cvae":
        # two branches feed the decoder trunk p_y_z_in at full resolution:
        #   z branch: y -> prior_z_y -> z -> p_z_in
        #   y branch: y -> p_y_in (identity when None)
        # total reach = max(branch margins) + trunk + worst output head.
        m_z = 0.0
        f = 1.0
        for key in ("prior_z_y", "p_z_in"):
            dm, f = spec_receptive_margin(architecture.get(key), f)
            m_z += dm
        m_y, _ = spec_receptive_margin(architecture.get("p_y_in"), 1.0)
        m, f_t = spec_receptive_margin(architecture.get("p_y_z_in"), 1.0)
        m += max(m_z, m_y)
        heads = architecture["p_y_z_out"]
        m += max(spec_receptive_margin(h, f_t)[0] for h in heads)
    elif model_kind == "cgan":
        from baryon_painter_tpu.models.cgan import cgan_generator_spec
        body, head = cgan_generator_spec(
            architecture.get("in_channels", 2),
            architecture.get("n_res_blocks", 9),
            architecture.get("upsample", "transpose"))
        m, f = spec_receptive_margin(body, 1.0)
        m += spec_receptive_margin(head, f)[0]
    else:
        raise ValueError(f"Unknown model kind {model_kind!r}")
    f_align = latent_downsample(architecture)
    return int(math.ceil(m / f_align)) * f_align


# --------------------------------------------------------------------- #
# slab paint bodies
# --------------------------------------------------------------------- #

def _cvae_slab_fn(painter, z_mode: str, transform: bool,
                  inverse_transform: bool):
    """(variables, slab(H,W), zs(1,), eps|None) -> painted slab (H,W)."""
    model = painter.model
    in_tf = painter.transforms[painter.input_field]
    in_stats = painter.stats[painter.input_field]
    out_field = painter.label_fields[0]
    out_tf = painter.transforms[out_field]
    out_stats = painter.stats[out_field]
    min_z_var = painter.architecture.get("min_z_var", 1e-7)

    def fn(variables, slab, zs, eps):
        y = slab[None]  # (1, H, W)
        if transform:
            y = in_tf.forward(y, in_stats, zs)
        # split-scale transforms emit (N, C, H, W); mirror painter._paint
        y = y[..., None] if y.ndim == 3 else jnp.moveaxis(y, -3, -1)
        z_mu, z_log_var = model.apply(variables, y, zs, train=False,
                                      method=model.prior)
        if z_mode == "mean":
            z_latent = z_mu
        elif z_mode == "zero":
            z_latent = jnp.zeros_like(z_mu)
        elif z_mode == "sample":
            sigma = jnp.exp(z_log_var / 2) + min_z_var
            z_latent = z_mu + eps[None].astype(z_mu.dtype) * sigma
        else:
            raise ValueError(f"Unknown z_mode {z_mode!r}")
        pred = model.apply(variables, y, zs, z=z_latent, train=False,
                           method=model.sample_P)
        if pred.shape[-1] != 1:
            raise ValueError("paint_plane supports single-channel output "
                             f"fields; model emitted {pred.shape[-1]}")
        pred = pred[..., 0]  # (1, H, W)
        if inverse_transform:
            pred = out_tf.inverse(pred, out_stats, zs)
        return pred[0]

    return fn


def _cgan_slab_fn(painter, transform: bool, inverse_transform: bool):
    # the painter's own jitted paint fn (transform -> generator -> inverse)
    # IS the slab computation — reuse it rather than re-implementing the
    # channel/transform conventions (jit-in-jit inlines)
    def fn(variables, slab, zs, eps):
        del eps
        return painter._paint_fn(variables, slab[None], zs,
                                 transform=transform,
                                 inverse_transform=inverse_transform)[0]

    return fn


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------- #
# the public entry point
# --------------------------------------------------------------------- #

def paint_plane(painter, plane, z: float, mesh: Optional[Mesh] = None,
                axis_name: Optional[str] = None, halo: Optional[int] = None,
                z_mode: str = "sample", rng=None, transform: bool = True,
                inverse_transform: bool = True):
    """Paint a full (H, W) plane seam-free, optionally sharded over a mesh.

    Parameters
    ----------
    painter : CVAEPainter or CGANPainter (loaded / trained).
    plane : (H, W) array in the painter's input-field units, at the
        painter's TRAINING resolution (tile_L / tile_size per pixel) —
        resample first if the native plane resolution differs
        (ops/resample.zoom, as the lightcone pipeline does for tiles).
    z : scalar redshift for the whole plane (one lightcone shell).
    mesh : optional 1-D ``jax.sharding.Mesh``; rows are sharded over
        ``axis_name`` (default: the mesh's first axis). When the periodic
        height splits into n aligned slabs and the halo fits one slab,
        halos ride ICI via a ``lax.ppermute`` ring; otherwise halo-extended
        slabs are gathered from the periodic plane by mod indexing (same
        result, no ring constraint). ``None`` paints unsharded with
        identical periodic-wrap semantics — all three paths agree exactly.
    halo : one-sided receptive-field margin in pixels; default
        :func:`required_halo` of the painter's architecture.
    z_mode : 'sample' (prior sample, reference behavior) | 'mean' | 'zero'.
    rng : PRNG key for 'sample' mode (default: key 0).

    Returns the painted (H, W) plane as a jax array (sharded over the mesh
    when one is given).
    """
    from baryon_painter_tpu.painter import CGANPainter

    kind = "cgan" if isinstance(painter, CGANPainter) else "cvae"
    arch = painter.architecture if kind == "cvae" else \
        painter.meta["model_architecture"]
    f = latent_downsample(arch)
    if halo is None:
        halo = required_halo(arch, kind)
    halo = _round_up(max(int(halo), f), f)

    plane = jnp.asarray(plane, jnp.float32)
    if plane.ndim != 2:
        raise ValueError(f"paint_plane expects a 2-D plane, got "
                         f"{plane.shape}")
    H, W = plane.shape

    if mesh is not None:
        if axis_name is None:
            axis_name = mesh.axis_names[0]
        n = mesh.shape[axis_name]
    else:
        n = 1

    # Canonical boundary period: the conv-stride lattice must be
    # commensurate with the wrap period, so the plane is treated as
    # (Q, Wq)-periodic with Q = round_up(H, f) — INDEPENDENT of the device
    # count, so sharded and unsharded paints agree for every plane size
    # and mesh. When f | H this is the plane's true period; otherwise no
    # exact periodic semantics exist on the lattice and the wrapped row
    # band is the (documented) boundary treatment.
    Q = _round_up(H, f)
    Wq = _round_up(W, f)
    if (Q, Wq) != (H, W):
        plane = jnp.pad(plane, ((0, Q - H), (0, Wq - W)), mode="wrap")

    zs = jnp.full((1,), float(z), jnp.float32)
    hf = halo // f
    cz = int(arch["dim_z"][0]) if kind == "cvae" else 0

    eps = None
    if kind == "cvae" and z_mode == "sample":
        if rng is None:
            rng = jax.random.PRNGKey(0)
        eps = jax.random.normal(rng, (Q // f, Wq // f, cz), jnp.float32)

    slab_fn = (_cvae_slab_fn(painter, z_mode, transform, inverse_transform)
               if kind == "cvae"
               else _cgan_slab_fn(painter, transform, inverse_transform))

    def periodic_extend(x, pad_r, pad_c):
        # mod-index gather instead of jnp.pad(mode="wrap"): valid even when
        # the pad exceeds the array (tiny planes with big halos)
        r = jnp.arange(-pad_r, x.shape[0] + pad_r) % x.shape[0]
        c = jnp.arange(-pad_c, x.shape[1] + pad_c) % x.shape[1]
        return x[r[:, None], c[None, :]]

    if mesh is None:
        ext = periodic_extend(plane, halo, halo)
        eps_arg = periodic_extend(eps, hf, hf) if eps is not None else None
        out = jax.jit(slab_fn)(painter.variables, ext, zs, eps_arg)
        return out[halo:-halo, halo:-halo][:H, :W]

    try:
        from jax import shard_map
    except ImportError:  # jax < 0.8
        from jax.experimental.shard_map import shard_map

    variables = jax.device_put(painter.variables, NamedSharding(mesh, P()))
    use_eps = eps is not None

    if Q % (n * f) == 0 and halo <= Q // n:
        # Fast path: equal slabs; halos ride ICI via a ppermute ring
        # (ring = the canonical Q-periodic boundary).
        Hl = Q // n
        perm_down = [(j, (j + 1) % n) for j in range(n)]  # bottoms -> tops
        perm_up = [(j, (j - 1) % n) for j in range(n)]    # tops -> bottoms
        plane_w = periodic_extend(plane, 0, halo)
        eps_pad = (periodic_extend(eps, hf, hf) if use_eps
                   else jnp.zeros((1, 1, 1), jnp.float32))

        def body(variables, slab, zs_, eps_pad_):
            i = lax.axis_index(axis_name)
            top = lax.ppermute(slab[-halo:], axis_name, perm_down)
            bot = lax.ppermute(slab[:halo], axis_name, perm_up)
            ext = jnp.concatenate([top, slab, bot], axis=0)
            eps_slab = None
            if use_eps:
                eps_slab = lax.dynamic_slice(
                    eps_pad_, (i * (Hl // f), 0, 0),
                    (Hl // f + 2 * hf, eps_pad_.shape[1], cz))
            out = slab_fn(variables, ext, zs_, eps_slab)
            return out[halo:-halo, halo:-halo]

        sharded = shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(axis_name, None), P(), P()),
            out_specs=P(axis_name, None))
        plane_sh = jax.device_put(plane_w,
                                  NamedSharding(mesh, P(axis_name, None)))
        out = jax.jit(sharded)(variables, plane_sh, zs, eps_pad)
        return out[:H, :W]

    # General path: Q doesn't split into n aligned slabs (or the halo
    # exceeds one slab). Gather halo-extended slabs from the Q-periodic
    # plane by mod indexing — each device gets its overlapping slab
    # directly; the tail slab wraps and its duplicate rows fall off the
    # final crop. No constraint ties halo to the slab height here.
    Hl = _round_up(-(-Q // n), f)  # ceil(Q/n) rounded up to the lattice
    row_idx = (np.arange(n)[:, None] * Hl
               + np.arange(-halo, Hl + halo)[None, :]) % Q
    col_idx = np.arange(-halo, Wq + halo) % Wq
    ext_slabs = plane[jnp.asarray(row_idx)[:, :, None],
                      jnp.asarray(col_idx)[None, None, :]]
    if use_eps:
        zrow = (np.arange(n)[:, None] * (Hl // f)
                + np.arange(-hf, Hl // f + hf)[None, :]) % (Q // f)
        zcol = np.arange(-hf, Wq // f + hf) % (Wq // f)
        eps_slabs = eps[jnp.asarray(zrow)[:, :, None],
                        jnp.asarray(zcol)[None, None, :]]
    else:
        eps_slabs = jnp.zeros((n, 1, 1, 1), jnp.float32)

    def body_gather(variables, ext, zs_, eps_slab):
        out = slab_fn(variables, ext[0],
                      zs_, eps_slab[0] if use_eps else None)
        return out[None, halo:-halo, halo:-halo]

    sharded = shard_map(
        body_gather, mesh=mesh,
        in_specs=(P(), P(axis_name, None, None), P(),
                  P(axis_name, None, None, None)),
        out_specs=P(axis_name, None, None))
    slabs_sh = jax.device_put(ext_slabs,
                              NamedSharding(mesh, P(axis_name, None, None)))
    eps_sh = jax.device_put(eps_slabs,
                            NamedSharding(mesh,
                                          P(axis_name, None, None, None)))
    out = jax.jit(sharded)(variables, slabs_sh, zs, eps_sh)
    return out.reshape(n * Hl, Wq)[:H, :W]


def calibrate_halo(painter, z: float = 0.5, tol: float = 1e-4,
                   probe: Optional[np.ndarray] = None, rng=None) -> int:
    """Empirically find the smallest sufficient halo for ``painter``.

    :func:`required_halo` is a conservative bound (transposed-conv reach is
    rounded up per layer); the true receptive field is often substantially
    smaller, and the halo sets the SP overhead directly (each device pays
    ``2*halo`` extra rows). This measures it: paint a random probe plane at
    the analytic bound, then binary-search the smallest aligned halo whose
    painted plane matches within ``tol`` relative error (latent noise held
    fixed on the global grid, so the comparison isolates the halo).

    Run once per architecture (CPU is fine) and pass the result as
    ``paint_plane(..., halo=...)``. Returns a multiple of the alignment
    granularity.
    """
    from baryon_painter_tpu.painter import CGANPainter

    kind = "cgan" if isinstance(painter, CGANPainter) else "cvae"
    arch = painter.architecture if kind == "cvae" else \
        painter.meta["model_architecture"]
    f = latent_downsample(arch)
    h_ref = required_halo(arch, kind)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # probe rows must exceed 2*h_ref so crops at every candidate halo see
    # genuinely different neighbourhoods
    rows = _round_up(2 * h_ref + 4 * f, f)
    if probe is None:
        nprng = np.random.default_rng(0)
        # positive, in the rough amplitude range of the training field
        mean0 = float(np.asarray(
            painter.stats[painter.input_field].at_z(z)[0]))
        probe = np.abs(nprng.lognormal(0.0, 1.0, size=(rows, 2 * f))
                       * max(abs(mean0), 1e-3))

    ref = np.asarray(paint_plane(painter, probe, z, halo=h_ref, rng=rng))
    scale = float(np.abs(ref).max()) or 1.0

    def ok(h):
        out = np.asarray(paint_plane(painter, probe, z, halo=h, rng=rng))
        return float(np.abs(out - ref).max()) / scale <= tol

    lo, hi = 0, h_ref // f  # in units of f; lo is exclusive-unverified
    # standard binary search for the smallest sufficient multiple of f
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if ok(mid * f):
            hi = mid
        else:
            lo = mid
    return hi * f
