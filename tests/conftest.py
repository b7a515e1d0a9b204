"""Test env: run on CPU with 8 virtual devices so multi-chip sharding is
exercised without TPU hardware (the TPU-native analogue of the reference's
'multi-node only via dist_train.sh' gap — see SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
