"""Test harness: force a virtual 8-device CPU platform BEFORE backend init.

Multi-device sharding paths run in CI without a TPU slice via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4). This box's
sitecustomize imports jax at interpreter startup with JAX_PLATFORMS=axon
(real TPU), so plain env mutation is too late — ``jax.config.update`` still
works because backends initialize lazily. Set ``PSIM_TEST_REAL_DEVICES=1``
to run the suite on whatever hardware is attached instead.
"""

import os

if not os.environ.get("PSIM_TEST_REAL_DEVICES"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
