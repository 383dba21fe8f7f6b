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

from baryon_painter_tpu.models.layers import _is_canonical_res_block

__all__ = ["fuse_cvae_variables"]

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
