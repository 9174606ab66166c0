"""Test config: force an 8-virtual-device CPU platform so sharding tests run
without TPU hardware (SURVEY §4 implication (c)).

Note: this environment's sitecustomize prepends an 'axon' TPU platform to
jax_platforms at interpreter start; tests must override the *config* (not
just the env var) and must do so before any backend is initialized, else
every test would contend for the single tunneled TPU chip.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
