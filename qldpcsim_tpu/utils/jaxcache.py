"""Persistent XLA compilation cache (default on).

The reference pays no compile cost (NumPy is interpreted); here every jitted
pipeline shape compiles once per process, and on this environment's remote
TPU compiler a cold LP-code OSD bucket costs ~80 s. The JAX persistent
compilation cache eliminates that across processes (measured 0.65 s -> 0.07 s
round-trip through the axon tunnel), so cold-start shots/s for short sweeps
approach warm throughput after the first-ever run of a config.

Env knobs:
  QLDPC_DISABLE_JAX_CACHE=1   opt out entirely
  QLDPC_JAX_CACHE_DIR=<dir>   override the cache location
                              (default ~/.cache/qldpcsim_tpu/jax)
"""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache() -> None:
    """Idempotently point JAX at a persistent on-disk compilation cache.

    Safe to call before or after backend initialization; callers that import
    jax invoke this once at module import."""
    global _DONE
    if _DONE or os.environ.get("QLDPC_DISABLE_JAX_CACHE") == "1":
        _DONE = True
        return
    import jax

    cache_dir = os.environ.get(
        "QLDPC_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "qldpcsim_tpu", "jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that takes measurable compile time; the remote
        # (tunneled) TPU compiler makes even small graphs expensive.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # unwritable cache dir / unknown flags: run uncached
    _DONE = True
