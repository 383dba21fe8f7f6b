#!/usr/bin/env python
"""Regenerate the committed golden painted tiles (tests/goldens/).

For every committed checkpoint in trained_models/, paint a small batch of
deterministic synthetic DM tiles in portable float32 on CPU with a fixed
prior-sample key and store the result (float16, compressed). The companion
test (tests/test_paint_goldens.py) repaints the same inputs and compares —
a hermetic pin of the exact painted output of the shipped artifacts, so a
paint-path change (conv rewrites, fused kernels, BatchNorm, transforms,
checkpoint IO) that would alter the committed models' products cannot land
silently. Run this script ONLY when such a change is intended (or a
checkpoint is re-promoted) and the new output has been re-validated
through the P(k) gate (scripts/fidelity_check.py --eval-only).

The reference has no analogue (its trained blobs are missing upstream,
.MISSING_LARGE_BLOBS:1-2); this guards the parity artifacts we ship.
"""
import os
import sys

if os.environ.get("JAX_PLATFORMS") != "cpu":
    # a TPU-session sitecustomize may force-initialize the TPU backend
    # before __main__ runs, and TPU f32 convs (default MXU precision) differ
    # from CPU f32 by far more than the pin test's tolerance; goldens must
    # be portable f32-on-CPU, pinned from the parent environment
    raise SystemExit("run as: JAX_PLATFORMS=cpu python "
                     "scripts/make_paint_goldens.py (goldens are pinned to "
                     "portable CPU float32 arithmetic)")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from baryon_painter_tpu.utils.platform import respect_env_platform  # noqa: E402

respect_env_platform()

import numpy as np  # noqa: E402

from golden_utils import GOLDEN_PATH, MODELS, paint_golden  # noqa: E402


def main():
    import jax
    if jax.default_backend() != "cpu":
        raise SystemExit(f"jax backend is {jax.default_backend()!r}; goldens "
                         f"must be painted on cpu")
    arrays = {}
    for name, base, kind, tile, n in MODELS:
        if not os.path.exists(os.path.join(REPO, base + "_state.msgpack")):
            print(f"skip {name}: no checkpoint at {base}", file=sys.stderr)
            continue
        print(f"painting goldens: {name} ({tile}^2 x {n})", file=sys.stderr,
              flush=True)
        arrays[name] = paint_golden(base, kind, tile, n).astype(np.float16)
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez_compressed(GOLDEN_PATH, **arrays)
    size = os.path.getsize(GOLDEN_PATH) / 1e6
    print(f"wrote {GOLDEN_PATH} ({size:.2f} MB): {sorted(arrays)}")


if __name__ == "__main__":
    main()
