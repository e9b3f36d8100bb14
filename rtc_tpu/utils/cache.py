"""Persistent XLA compilation cache.

First compiles over a remote TPU link are expensive (seconds per program);
caching them on disk makes repeat CLI/bench invocations fast.
"""

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "RTC_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never fail the render over it
