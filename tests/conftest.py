"""Test configuration: force CPU with 8 virtual devices.

The reference repo has zero automated tests (SURVEY.md §4); the rebuild's test
strategy is golden-value unit tests per op (several directly against torch CPU,
which is baked into the image), property tests, gradient checks, and multi-chip
sharding tests on a virtual 8-device CPU mesh — the TPU-world "fake backend".

Note: in this image the TPU is attached through the experimental `axon` plugin,
which overrides the ``JAX_PLATFORMS`` env var — only the
``jax.config.update('jax_platforms', ...)`` call below reliably pins tests to
CPU. Set both anyway so spawned subprocesses inherit the intent.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
