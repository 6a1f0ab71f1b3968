"""Test harness: force a virtual 8-device CPU platform BEFORE jax imports.

Multi-device sharding paths run in CI without a TPU slice via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4). Set
``PSIM_TEST_REAL_DEVICES=1`` to run the suite on whatever is attached.
"""

import os

if not os.environ.get("PSIM_TEST_REAL_DEVICES"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
