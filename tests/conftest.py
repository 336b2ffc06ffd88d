"""Test env: force the CPU backend with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

Note: this environment ships a sitecustomize that pins JAX_PLATFORMS=axon
(TPU tunnel), so the env var alone is not enough — we override via
jax.config before any backend is initialized.
"""

import os
import sys

# Clean-checkout support: make `pytest tests/` work without an editable
# install or a manual PYTHONPATH (the package lives at the repo root).
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the second-order meta steps take ~60s to
# compile on CPU; caching makes repeat test runs fast.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
