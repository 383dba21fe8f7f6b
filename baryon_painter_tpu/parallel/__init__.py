"""Parallelism: device meshes and sharding helpers."""

from baryon_painter_tpu.parallel.mesh import (  # noqa: F401
    data_parallel_mesh, replicate, shard_batch)
