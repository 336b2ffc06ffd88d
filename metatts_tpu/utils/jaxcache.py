"""Persistent XLA compilation cache.

The second-order meta step takes minutes to compile (especially through the
remote-compile TPU tunnel); caching compiled executables across processes
makes reruns start in seconds.  Called by main.py / bench.py at startup.
"""

import os


def enable_compilation_cache(path=None):
    import jax

    path = path or os.environ.get(
        "METATTS_JAX_CACHE",
        os.path.expanduser("~/.cache/metatts_tpu/jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
