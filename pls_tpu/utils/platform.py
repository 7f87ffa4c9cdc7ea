"""Platform selection helpers.

Some images force-register an accelerator plugin from `sitecustomize` and
set `jax_platforms` programmatically at interpreter start, which silently
defeats the standard `JAX_PLATFORMS=cpu` environment contract.  Backends
initialize lazily, so restoring the env's intent at the config level works
as long as it runs before first device use."""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Make an explicit JAX_PLATFORMS env var win over sitecustomize-forced
    platform config (no-op when unset or already honored)."""
    env_plat = os.environ.get("JAX_PLATFORMS")
    if not env_plat:
        return
    import jax

    if jax.config.jax_platforms != env_plat:
        try:
            jax.config.update("jax_platforms", env_plat)
        except Exception:
            pass
