"""Numerical ops: resampling, tile gather/blend, Pallas kernels."""
