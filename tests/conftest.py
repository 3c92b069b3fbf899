"""Test config: run everything on a virtual 8-device CPU mesh.

The reference has no test suite (SURVEY.md §4); multi-device logic here is
tested with XLA's forced host-platform device count, the JAX-native
replacement for the reference's missing distributed tests.

Note: the environment may pin jax_platforms to a TPU plugin at import time
(sitecustomize), so the platform must be forced back to CPU via jax.config,
not env vars.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
