"""baryon_painter_tpu: TPU-native framework for baryon painting.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
tilmantroester/baryon_painter: CVAE/CGAN generative models that paint gas
pressure onto dark-matter density tiles, plus the full data pipeline
(BAHAMAS tile datasets, invertible transforms), training engine, painting
API, and SLICS lightcone / Compton-y map assembly.
"""

__version__ = "0.1.0"

from baryon_painter_tpu import transforms  # noqa: F401
