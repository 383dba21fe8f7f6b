"""Data layer: BAHAMAS tile stacks, sample indexing, synthetic fixtures."""

from baryon_painter_tpu.data.dataset import BahamasTileDataset  # noqa: F401
from baryon_painter_tpu.data.synthetic import make_synthetic_stacks  # noqa: F401
