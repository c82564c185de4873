"""Parity vs the actual reference modules (subprocess wrapper).

The checks instantiate the reference implementation's own NNX networks,
which require flax's pre-0.12 module semantics (FLAX_PYTREE_MODULE=false);
that flag is baked in at import time, so the checks run in a subprocess.
See tests/reference_parity_impl.py for the actual assertions.
"""

import os
import subprocess
import sys

import pytest

if not os.path.isdir('/root/reference'):
  pytest.skip('reference not available', allow_module_level=True)


def test_reference_parity_suite():
  env = dict(os.environ)
  env['FLAX_PYTREE_MODULE'] = 'false'
  env['JAX_PLATFORMS'] = 'cpu'
  r = subprocess.run(
      [sys.executable, '-m', 'tests.reference_parity_impl'],
      capture_output=True, text=True, env=env,
      cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
  assert r.returncode == 0, f'STDOUT:\n{r.stdout}\nSTDERR:\n{r.stderr}'
  assert 'transformer parity OK' in r.stdout


def test_tisr_parity():
  """Executable TISR parity vs the reference's solar_radiation module
  (subprocess: it enables jax x64, a process-global flag)."""
  r = subprocess.run(
      [sys.executable, '-m', 'tests.tisr_parity_impl'],
      capture_output=True, text=True, env=dict(os.environ),
      cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
  assert r.returncode == 0, f'STDOUT:\n{r.stdout}\nSTDERR:\n{r.stderr}'
  assert 'TISR parity OK' in r.stdout
