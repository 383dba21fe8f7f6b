"""SLICS lightcone pipeline: tiling, batched painting, y-map assembly."""

from baryon_painter_tpu.lightcone.tiling import (  # noqa: F401
    generate_tiling, get_tile, make_weight_map)
from baryon_painter_tpu.lightcone.pipeline import process_slics  # noqa: F401
from baryon_painter_tpu.lightcone.ymap import create_y_map  # noqa: F401
