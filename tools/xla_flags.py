"""Stdlib-only XLA host-platform env setup, safe to call BEFORE jax import.

Importing gencast_tpu pulls in jax (package __init__), so callers that
must configure the environment first (virtual-device dryruns, multi-process
CPU stand-ins) share this dependency-free helper instead of four hand-rolled
copies of the flag merge.
"""

from __future__ import annotations

import os


def force_host_device_count(n: int, env=None) -> None:
  """Sets --xla_force_host_platform_device_count=n in XLA_FLAGS.

  Merge, not overwrite: any other inherited XLA flags are kept, but a
  pre-set device count (e.g. leaked from a test harness) must not
  override the requested n — with duplicate flags the later one wins.
  Mutates os.environ, or the given env dict (for subprocess envs).
  """
  env = os.environ if env is None else env
  inherited = [f for f in env.get('XLA_FLAGS', '').split()
               if not f.startswith('--xla_force_host_platform_device_count')]
  env['XLA_FLAGS'] = ' '.join(
      [f'--xla_force_host_platform_device_count={n}'] + inherited)
