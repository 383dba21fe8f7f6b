"""baryon_painter_tpu: TPU-native framework for baryon painting.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
tilmantroester/baryon_painter: CVAE/CGAN generative models that paint gas
pressure onto dark-matter density tiles, plus the full data pipeline
(BAHAMAS tile datasets, invertible transforms), training engine, painting
API, and SLICS lightcone / Compton-y map assembly.
"""

__version__ = "0.1.0"

from baryon_painter_tpu import transforms  # noqa: F401

_LAZY = {
    "CVAEPainter": ("baryon_painter_tpu.painter", "CVAEPainter"),
    "CGANPainter": ("baryon_painter_tpu.painter", "CGANPainter"),
    "load_painter": ("baryon_painter_tpu.painter", "load_painter"),
    "CVAE": ("baryon_painter_tpu.models.cvae", "CVAE"),
    "BahamasTileDataset": ("baryon_painter_tpu.data.dataset",
                           "BahamasTileDataset"),
    "CVAETrainer": ("baryon_painter_tpu.train.trainer", "CVAETrainer"),
    "CGANTrainer": ("baryon_painter_tpu.train.cgan", "CGANTrainer"),
    "process_slics": ("baryon_painter_tpu.lightcone.pipeline",
                      "process_slics"),
    "create_y_map": ("baryon_painter_tpu.lightcone.ymap", "create_y_map"),
    "pseudo_pofk_2d": ("baryon_painter_tpu.power_spectrum", "pseudo_pofk_2d"),
}


def __getattr__(name):
    """Lazy top-level exports (keeps `import baryon_painter_tpu` light)."""
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'baryon_painter_tpu' has no attribute "
                         f"'{name}'")
