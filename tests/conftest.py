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
