"""Golden-output pin of the committed trained_models/ checkpoints.

Repaints deterministic synthetic DM tiles with each committed checkpoint
in portable float32 (CPU) and compares against the committed goldens
(tests/goldens/paint_goldens.npz, regenerated ONLY deliberately via
scripts/make_paint_goldens.py). Catches any paint-path change — conv
rewrites, fused kernels, BatchNorm internals, transform math, checkpoint
IO — that would silently alter the shipped artifacts' products.

Tolerances: goldens are stored float16 (~1e-3 relative resolution) and f32
conv reassociation across XLA versions/hosts is ~1e-6, so rtol 5e-3 on a
field whose interesting failures are 10%+ leaves 20x headroom both ways.
"""
import os

import numpy as np
import pytest

from golden_utils import GOLDEN_PATH, MODELS, REPO, paint_golden

# slow: loads every committed checkpoint and compiles its paint graph
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def goldens():
    import jax
    if jax.default_backend() != "cpu":
        # goldens are pinned to portable CPU f32; TPU f32 convs (default MXU
        # precision) differ by more than the tolerance (BPT_TEST_PLATFORM)
        pytest.skip("golden pin is CPU-only")
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("no committed goldens (run scripts/make_paint_goldens.py)")
    with np.load(GOLDEN_PATH) as z:
        return {k: z[k] for k in z.files}


@pytest.mark.parametrize("name,base,kind,tile,n",
                         MODELS, ids=[m[0] for m in MODELS])
def test_committed_checkpoint_paints_golden(goldens, name, base, kind,
                                            tile, n):
    if name not in goldens:
        pytest.skip(f"{name} not in goldens file")
    if not os.path.exists(os.path.join(REPO, base + "_state.msgpack")):
        pytest.skip(f"checkpoint {base} not present")
    got = paint_golden(base, kind, tile, n)
    want = goldens[name].astype(np.float32)
    assert got.shape == want.shape
    assert np.all(np.isfinite(got))
    # fields are strictly positive (softplus/tanh-inverse heads); compare
    # relative to the field scale so near-zero pixels don't dominate
    scale = np.abs(want).mean()
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3 * scale,
                               err_msg=f"{name}: painted output drifted "
                                       f"from the committed golden")
