"""Shared logic for the committed-checkpoint paint goldens.

Used by scripts/make_paint_goldens.py (writer) and
tests/test_paint_goldens.py (checker) so the inputs and paint procedure
cannot drift apart.
"""
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_PATH = os.path.join(REPO, "tests", "goldens", "paint_goldens.npz")

# (name, checkpoint base, painter kind, tile size, n tiles)
MODELS = [
    # archived (gate NEAR-MISS, trained_models/archive/README.md) but the
    # frozen bits still pin the transposed-conv paint path
    ("cvae_fiducial",
     "trained_models/archive/CVAE-fiducial-transpose-256/model", "cvae",
     256, 2),
    ("cvae_resize", "trained_models/CVAE/fiducial-resize/model", "cvae",
     256, 2),
    ("cvae_512", "trained_models/CVAE/fiducial-512/model", "cvae", 512, 1),
    ("cgan_fiducial", "trained_models/CGAN/fiducial/model", "cgan", 256, 2),
    # round-4/5 additions (VERDICT r4 weak 4): WIP/near-gate artifacts are
    # pinned too — their bits are the committed provenance of the
    # physical-stats and adv-ON experiment lines
    ("cvae_phys512_lt", "trained_models/CVAE/physical-512-lt-wip/model",
     "cvae", 512, 1),
    ("cvae_phys512_resize",
     "trained_models/CVAE/physical-512-resize-wip/model", "cvae", 512, 1),
    ("cgan_adv", "trained_models/CGAN/fiducial-adv/model", "cgan", 256, 2),
]


def golden_inputs(tile: int, n: int, seed: int = 1234):
    """Deterministic lognormal 'DM' tiles with plausible amplitude
    (mean ~1, heavy tail), independent of the data layer entirely."""
    rng = np.random.default_rng(seed + tile)
    g = rng.standard_normal((n, tile, tile)).astype(np.float32)
    # mild spatial correlation so the tiles aren't pure white noise
    f = np.fft.rfft2(g)
    ky = np.fft.fftfreq(tile)[:, None]
    kx = np.fft.rfftfreq(tile)[None, :]
    kk = np.sqrt(kx ** 2 + ky ** 2)
    f *= 1.0 / (1.0 + (kk * tile / 8.0) ** 1.1)
    g = np.fft.irfft2(f, s=(tile, tile)).astype(np.float32)
    g *= 1.0 / g.std()
    x = np.exp(g - 0.5).astype(np.float32)
    return x / x.mean(axis=(1, 2), keepdims=True)


def paint_golden(base: str, kind: str, tile: int, n: int) -> np.ndarray:
    """Paint the golden inputs with the committed checkpoint in portable
    float32 and a fixed prior-sample key."""
    import jax

    from baryon_painter_tpu.painter import CGANPainter, CVAEPainter

    cls = CVAEPainter if kind == "cvae" else CGANPainter
    painter = cls(os.path.join(REPO, base), dtype=None)
    tiles = golden_inputs(tile, n)
    zs = np.linspace(0.0, 1.0, n).astype(np.float32)
    kw = {"rng": jax.random.PRNGKey(7)} if kind == "cvae" else {}
    return np.asarray(painter.paint_batch(tiles, zs, **kw))
