"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin registers itself in every Python process via
sitecustomize and wins platform selection, so forcing CPU requires the jax
config update, not just the env var. XLA_FLAGS must be set before the first
backend initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
  os.environ["XLA_FLAGS"] = (
      _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
  config.addinivalue_line(
      "markers",
      "slow: heavyweight test (>~30s on this 1-core host); default tier "
      "runs -m 'not slow' (see CLAUDE.md), full tier runs everything.")

