"""Persistent XLA compilation cache.

PLS fits are small programs but the CV stack compiles several
vmapped/scanned variants; on modest hosts the compile dominates wall time.
Enabling JAX's persistent cache makes every repeat invocation (tests, CLI,
benchmarks, driver runs) start warm.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "PLS_TPU_CACHE_DIR", os.path.expanduser("~/.cache/pls_tpu_xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is best-effort; never fail the caller
        pass
