"""Checkpoint conversion to the fused-inference parameter layout.

The fused Pallas residual-block kernel (ops/pallas_conv.py) needs its
parameters under :class:`~baryon_painter_tpu.models.layers.FusedResBlock`'s
explicit names (``conv1_kernel`` / ``bn1_scale`` / ...), while checkpoints
trained with ``fused_res_blocks=False`` — including the committed
``trained_models`` artifacts, whose training path requires the unfused
modules — store them under the generic ``ResidualBlock_i/SpecSequential_0``
structure. The two layouts describe the *same function*; this module
renames the pytree so any canonical checkpoint can be painted through the
fused kernel (2.2x end-to-end painting on TPU, ROUNDLOG r1) without
retraining or re-saving.

Used by ``CVAEPainter(..., fused_inference=True)`` and the lightcone CLI's
``--fused-paint``.
"""
from __future__ import annotations

import copy

import numpy as np

from baryon_painter_tpu.models.layers import _is_canonical_res_block

__all__ = ["fuse_cvae_variables", "fuse_cgan_generator_variables"]

# the CVAE subnets built with the fused_res_blocks flag (models/cvae.py
# setup's mk()); only these can dispatch to FusedResBlock
_FUSED_SUBNETS = {
    "q_x_in": "q_x_in",
    "q_y_in": "q_y_in",
    "q_out": "q_x_y_out",
    "p_z_in": "p_z_in",
    "p_y_z_in": "p_y_z_in",
}


def _fuse_subnet(spec, params, stats):
    """Rename canonical residual blocks in one SpecSequential scope.

    Walks the spec in layer order, mirroring flax's per-class instance
    counters: the i-th residual block overall becomes FusedResBlock_<c>
    if canonical (c counts canonical blocks) and stays ResidualBlock_<n>
    otherwise (n counts the rest) — exactly the names SpecSequential
    produces with fused_res_blocks=True.
    """
    if spec is None or params is None:
        return params, stats
    params = dict(params)
    stats = dict(stats or {})
    i = c = n = 0
    for layer in spec:
        if str(layer[0]).lower() != "residual block":
            continue
        src = f"ResidualBlock_{i}"
        i += 1
        if not _is_canonical_res_block(layer[1]):
            dst = f"ResidualBlock_{n}"
            n += 1
            if dst != src:  # shift down past converted siblings
                params[dst] = params.pop(src)
                if src in stats:
                    stats[dst] = stats.pop(src)
            continue
        dst = f"FusedResBlock_{c}"
        c += 1
        inner_p = params.pop(src)["SpecSequential_0"]
        params[dst] = {
            "conv1_kernel": inner_p["Conv2d_0"]["kernel"],
            "bn1_scale": inner_p["BatchNorm_0"]["scale"],
            "bn1_bias": inner_p["BatchNorm_0"]["bias"],
            "conv2_kernel": inner_p["Conv2d_1"]["kernel"],
            "bn2_scale": inner_p["BatchNorm_1"]["scale"],
            "bn2_bias": inner_p["BatchNorm_1"]["bias"],
        }
        inner_s = stats.pop(src)["SpecSequential_0"]
        stats[dst] = {
            "bn1_mean": inner_s["BatchNorm_0"]["mean"],
            "bn1_var": inner_s["BatchNorm_0"]["var"],
            "bn2_mean": inner_s["BatchNorm_1"]["mean"],
            "bn2_var": inner_s["BatchNorm_1"]["var"],
        }
    return params, stats


def fuse_cvae_variables(variables: dict, architecture: dict):
    """Convert CVAE variables to the fused-inference layout.

    Returns ``(variables', architecture')`` where every canonical residual
    block's parameters are renamed into FusedResBlock form and
    ``architecture'`` carries ``fused_res_blocks=True``, so a model built
    from it computes the identical eval function through the fused kernel
    (XLA fallback off-TPU; tests/test_fuse.py pins equality).

    ``variables`` may be raw nested dicts (as loaded from a checkpoint) or
    live pytrees; values are passed through untouched.
    """
    arch = copy.deepcopy(dict(architecture))
    params = dict(variables.get("params", {}))
    stats = dict(variables.get("batch_stats", {}))
    for attr, key in _FUSED_SUBNETS.items():
        if attr not in params:
            continue
        spec = arch.get(key)
        if spec is None:
            continue
        params[attr], stats_attr = _fuse_subnet(
            spec, params[attr], stats.get(attr))
        if stats_attr:
            stats[attr] = stats_attr
    arch["fused_res_blocks"] = True
    return {"params": params, "batch_stats": stats}, arch


# --------------------------------------------------------------------- #
# CGAN generator: spectral-norm folding + fused residual blocks         #
# --------------------------------------------------------------------- #

def _sn_sigma_from_u(kernel, u, eps: float = 1e-12, n_steps: int = 1):
    """flax.linen.SpectralNorm's eval-time sigma, replicated exactly: the
    kernel reshaped to (fan_in, C_out), ``n_steps`` power iterations from
    the stored u vector with flax's epsilon-regularized l2 normalization,
    then sigma = v W u^T."""
    w = np.asarray(kernel, np.float32).reshape(-1, kernel.shape[-1])
    u0 = np.asarray(u, np.float32)
    for _ in range(n_steps):
        v0 = u0 @ w.T
        v0 = v0 / np.sqrt((v0 * v0).sum() + eps)
        u0 = v0 @ w
        u0 = u0 / np.sqrt((u0 * u0).sum() + eps)
    sigma = float((v0 @ w @ u0.T)[0, 0])
    return sigma if sigma != 0 else 1.0


def _fold_spectral_norm(params, stats):
    """Divide every spectrally-normalized parameter by its sigma, recursing
    through nested scopes; returns (params', stats') with the SpectralNorm
    state removed. After folding, a model built with spectral_norm=False
    computes the identical eval function."""
    params = dict(params)
    out_stats = {}
    for key, sub in (stats or {}).items():
        if not key.startswith("SpectralNorm_"):
            # recurse into nested module scopes (e.g. ResidualBlock_k)
            if key in params and isinstance(params[key], dict):
                params[key], sub = _fold_spectral_norm(params[key], sub)
            out_stats[key] = sub
            continue
        # SpectralNorm scopes hold flat slash-joined variable names
        # ("Conv2d_0/kernel/u", ".../sigma") — flax builds them as single
        # strings, not nested dicts
        for var_name, u in sub.items():
            if not var_name.endswith("/u"):
                continue
            *path, param_name, _ = var_name.split("/")
            node = params
            for part in path[:-1]:
                node = node[part]
            layer = dict(node[path[-1]]) if path else node
            sigma = _sn_sigma_from_u(layer[param_name], u)
            layer[param_name] = np.asarray(layer[param_name]) / sigma
            if path:
                node[path[-1]] = layer
    return params, out_stats


def fuse_cgan_generator_variables(variables: dict, architecture: dict):
    """Convert CGAN generator variables to the fused-inference layout.

    Folds the spectral normalization into the weights (flax's exact
    eval-time power-iteration sigma from the stored u vectors) and renames
    the canonical LeakyReLU residual blocks into FusedResBlock form.
    Returns ``(variables', generator_kwargs)`` where the generator must be
    rebuilt with ``CGANGenerator(**generator_kwargs)`` —
    ``spectral_norm=False, fused_res_blocks=True`` plus the architecture's
    own fields. Painting-path only (the folded weights carry no SN state to
    update)."""
    from baryon_painter_tpu.models.cgan import cgan_generator_spec
    arch = dict(architecture)
    body_spec, _head_spec = cgan_generator_spec(
        arch.get("in_channels", 2), arch.get("n_res_blocks", 9),
        arch.get("upsample", "transpose"))
    params = dict(variables.get("params", {}))
    stats = dict(variables.get("batch_stats", {}))
    for seq in ("SpecSequential_0", "SpecSequential_1"):
        if seq in params:
            params[seq], stats_seq = _fold_spectral_norm(
                params[seq], stats.get(seq))
            if stats_seq or seq in stats:
                stats[seq] = stats_seq
    params["SpecSequential_0"], stats_body = _fuse_subnet(
        body_spec, params["SpecSequential_0"],
        stats.get("SpecSequential_0"))
    if stats_body:
        stats["SpecSequential_0"] = stats_body
    kwargs = {"in_channels": arch.get("in_channels", 2),
              "n_res_blocks": arch.get("n_res_blocks", 9),
              "upsample": arch.get("upsample", "transpose"),
              "spectral_norm": False, "fused_res_blocks": True}
    return {"params": params, "batch_stats": stats}, kwargs
