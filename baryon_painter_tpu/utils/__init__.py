"""Utilities: constants, validation plotting, profiling."""
