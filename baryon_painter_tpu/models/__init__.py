"""Model layer: declarative architecture DSL, CVAE, CGAN."""

from baryon_painter_tpu.models import dsl  # noqa: F401
from baryon_painter_tpu.models.cvae import CVAE, fiducial_cvae_architecture  # noqa: F401
