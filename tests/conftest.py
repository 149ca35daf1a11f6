"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding is validated
without TPU pod hardware (tiered test strategy, SURVEY.md §4).

Two quirks of the environment this handles:
  * XLA_FLAGS must be set before JAX initializes its CPU client.
  * The hosting image force-registers a remote 'axon' TPU backend via
    sitecustomize and overrides ``jax_platforms`` at interpreter boot, so the
    env var alone is not enough — we reset the config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
