"""Process-level JAX setup shared by every entry point.

Two concerns the reference never had but a TPU deployment does:

* **Platform forcing.**  The axon TPU plugin ignores the
  ``JAX_PLATFORMS`` env var, so honoring ``DEFTET_PLATFORM=cpu|tpu``
  must go through ``jax.config.update("jax_platforms", ...)`` (which
  always wins).  Every CLI/script funnels through here.

* **Persistent compilation cache.**  The res-70 train step costs
  ~500 s of XLA compile (BENCH_r04 ``compile_s``); with the persistent
  cache that is paid once per code/shape change instead of once per
  process.  Cache dir precedence: ``$JAX_COMPILATION_CACHE_DIR`` >
  the repo-local ``.jax_cache`` (gitignored).  Opt out with
  ``DEFTET_NO_COMPILE_CACHE=1`` (e.g. when measuring cold compiles).
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def setup_jax(platform: str | None = None) -> None:
    """Idempotent: force the platform (if requested) and enable the
    persistent compilation cache.  Call before any jax computation."""
    import jax

    plat = platform or os.environ.get("DEFTET_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    if os.environ.get("DEFTET_NO_COMPILE_CACHE"):
        return
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_CACHE)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default min_compile_time is 1s; keep everything non-trivial
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # cache is an optimization, never a hard dependency
        pass
