"""Parallelism: device meshes, sharding helpers, spatial (halo) painting."""

from baryon_painter_tpu.parallel.mesh import (  # noqa: F401
    data_parallel_mesh, replicate, shard_batch)
from baryon_painter_tpu.parallel.spatial import (  # noqa: F401
    paint_plane, required_halo)
