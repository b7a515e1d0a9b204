"""Test env: run on CPU with 8 virtual devices so multi-chip sharding is
exercised without TPU hardware (the TPU-native analogue of the reference's
'multi-node only via dist_train.sh' gap — see SURVEY.md §4).

jax is pre-imported in this image, so setting JAX_PLATFORMS via os.environ is
too late; use jax.config.update before any backend is initialized instead.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the test suite (separate dir from the TPU
# cache): the fast lane spends >2 min of its ~6 min budget compiling the
# same fixture models every run on this 1-core box; the cache is keyed on
# the HLO hash so it can never mask a code change.
_cache = os.path.expanduser("~/.cache/dhd_tpu/xla-cpu-tests")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
