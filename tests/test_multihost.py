"""Real multi-process jax.distributed coverage (tools/multihost_smoke.py).

Everything else in the suite runs on a single-process virtual device mesh,
which cannot catch multi-process-only failures: placing host arrays onto
shardings that span non-addressable devices (meshes.shard_model on a pod),
cross-process collectives in the psum'd gradient path, or per-process
weight/PRNG divergence. This test spawns TWO actual processes joined by a
localhost coordinator (gloo CPU collectives) and checks they compute the
same sharded train-step loss and ensemble-sample checksum.

Reference role: the reference has no multi-process path at all (SURVEY
§2.3); this backs scripts/ensemble_forecast_pod.py --multihost.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, 'tools', 'multihost_smoke.py')


def _free_port() -> int:
  with socket.socket() as s:
    s.bind(('localhost', 0))
    return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_and_ensemble():
  port = _free_port()
  # The smoke script owns its env (sets XLA_FLAGS/JAX_PLATFORMS before jax
  # import); just make sure the conftest's 8-device flag doesn't leak into
  # any earlier import in the child.
  env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
  procs = [
      subprocess.Popen([sys.executable, SCRIPT, str(i), '2', str(port)],
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, env=env, cwd=REPO)
      for i in range(2)
  ]
  outs = []
  for p in procs:
    try:
      out, _ = p.communicate(timeout=600)
    except subprocess.TimeoutExpired:
      for q in procs:
        q.kill()
      raise
    outs.append(out)

  for i, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f'process {i} failed:\n{out}'

  oks = [line for out in outs for line in out.splitlines()
         if line.startswith('MULTIHOST_OK')]
  assert len(oks) == 2, outs
  # Same loss and ensemble checksum on both processes: parameter
  # placement, batch sharding, and collectives agree across the boundary.
  vals = {line.split(' ', 1)[1].split('/', 1)[1] for line in oks}
  assert len(vals) == 1, oks
