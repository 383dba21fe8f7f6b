"""Checkpointing: pytree state + declarative JSON metadata.

Replaces the reference's (torch state_dict, dill'd closures) pair
(painter.py:395-445) with a portable format:

  * ``<base>_state.msgpack`` — flax-serialized pytree: params, batch_stats,
    and (optionally) optimizer state + step counters, enabling true
    resume-from-checkpoint (the reference could not resume; SURVEY §5).
  * ``<base>_meta.json`` — dataset geometry (L, n_grid, tile_L, n_tile,
    tile_size, fields, scale_to_SLICS), the architecture dict, per-field
    transform SPECS and stats TABLES (no code objects).
"""
from __future__ import annotations

import json
import os
from typing import Optional

import flax.serialization
import jax
import numpy as np

from baryon_painter_tpu.transforms import FieldStats, transform_from_dict

__all__ = ["save_checkpoint", "load_checkpoint", "meta_from_dataset",
           "rotate_checkpoints"]


def _jsonify(obj):
    if isinstance(obj, dict):
        return {k: _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


def meta_from_dataset(dataset, architecture: dict,
                      model_kind: str = "cvae") -> dict:
    """Collect checkpoint metadata from a dataset (painter.py:399-414)."""
    return {
        "model_kind": model_kind,
        "L": dataset.L,
        "n_grid": dataset.n_grid,
        "tile_L": dataset.tile_L,
        "n_tile": dataset.n_tile,
        "tile_size": dataset.tile_size,
        "input_field": dataset.input_field,
        "label_fields": list(dataset.label_fields),
        "scale_to_SLICS": dataset.scale_to_SLICS,
        "transforms": {f: dataset.transforms[f].to_dict()
                       for f in dataset.fields},
        "stats": {f: dataset.stats[f].to_dict() for f in dataset.fields},
        "model_architecture": _jsonify(architecture),
    }


def save_checkpoint(base_path: str, state: dict, meta: dict):
    """Write the (state, meta) pair. ``state`` is any pytree of arrays."""
    os.makedirs(os.path.dirname(os.path.abspath(base_path)), exist_ok=True)
    # to_state_dict converts optax namedtuples/tuples into msgpack-able dicts
    state = flax.serialization.to_state_dict(jax.device_get(state))
    with open(base_path + "_state.msgpack", "wb") as f:
        f.write(flax.serialization.msgpack_serialize(state))
    with open(base_path + "_meta.json", "w") as f:
        json.dump(_jsonify(meta), f, indent=1)


def rotate_checkpoints(directory: str, keep: int,
                       prefix: str = "checkpoint_sample") -> list:
    """Delete all but the ``keep`` newest periodic checkpoints in
    ``directory`` (matched by ``prefix``; the zero-padded sample count in the
    filename makes lexicographic order == sample order). Returns the deleted
    base paths. ``keep <= 0`` keeps everything (reference behavior:
    painter.py:245-251 accumulates checkpoints unboundedly)."""
    if keep <= 0:
        return []
    bases = sorted(
        f[:-len("_state.msgpack")] for f in os.listdir(directory)
        if f.startswith(prefix) and f.endswith("_state.msgpack"))
    deleted = []
    for base in bases[:-keep] if len(bases) > keep else []:
        for suffix in ("_state.msgpack", "_meta.json"):
            path = os.path.join(directory, base + suffix)
            if os.path.exists(path):
                os.remove(path)
        deleted.append(base)
    return deleted


def load_checkpoint(base_path: str,
                    target: Optional[dict] = None) -> tuple:
    """Load (state, meta). If ``target`` is given the state is restored into
    its pytree structure; otherwise raw nested dicts of numpy arrays return."""
    with open(base_path + "_state.msgpack", "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    if target is not None:
        raw = flax.serialization.from_state_dict(target, raw)
    with open(base_path + "_meta.json") as f:
        meta = json.load(f)
    return raw, meta


def transforms_from_meta(meta: dict):
    """Rebuild {field: transform} and {field: FieldStats} from metadata."""
    transforms = {f: transform_from_dict(d)
                  for f, d in meta["transforms"].items()}
    stats = {f: FieldStats.from_dict(d) for f, d in meta["stats"].items()}
    return transforms, stats
