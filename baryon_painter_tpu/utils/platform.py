"""Platform selection under environments that auto-register a backend.

The session's tunneled-TPU sitecustomize force-registers its backend
programmatically, overriding JAX_PLATFORMS. Scripts call
``respect_env_platform()`` right after importing jax so an explicit
``JAX_PLATFORMS=cpu ...`` keeps meaning what it says.
"""
from __future__ import annotations

import os

__all__ = ["respect_env_platform"]


def respect_env_platform():
    """Re-assert JAX_PLATFORMS over any programmatically-registered backend.

    No-op when the env var is unset or a backend is already initialized.
    """
    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platforms)
    except RuntimeError:
        pass  # backend already initialized; too late to switch
