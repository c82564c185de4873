"""Driver-contract smoke for bench.py: it must emit metric JSON lines and
exit 0 within a wall-clock budget, skipping sections that do not fit
(round-2 regression: the driver's bench run timed out inside the 0.25-deg
section and the whole artifact landed as rc=124 with no qdeg metric)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_budget_guard_and_json_contract():
  env = dict(os.environ)
  env.update(BENCH_CPU='1', BENCH_SECTIONS='tiny,nano,onedeg,qdeg',
             BENCH_BUDGET_S='240')
  r = subprocess.run([sys.executable, os.path.join(REPO, 'bench.py')],
                     capture_output=True, text=True, env=env, cwd=REPO,
                     timeout=300)
  assert r.returncode == 0, f'STDOUT:\n{r.stdout}\nSTDERR:\n{r.stderr}'
  lines = [l for l in r.stdout.splitlines() if l.startswith('{')]
  if 'deadline' not in r.stderr:
    # All three tiny metrics fit the budget (warm-cache case).
    assert len(lines) >= 3, f'expected tiny metrics, got:\n{r.stdout}'
  else:
    # Cold-cache CPU compiles can eat the whole budget inside the tiny
    # section (observed on a fresh machine: fwd+train landed, the sampler
    # compile crossed the deadline). The driver contract is rc=0 plus
    # whatever metrics were emitted before the kill — that's what the
    # round-2 regression broke, and what this test pins.
    assert len(lines) >= 1, f'no metrics before deadline:\n{r.stderr}'
  for line in lines:
    m = json.loads(line)
    assert {'metric', 'value', 'unit', 'vs_baseline'} <= set(m)
    assert isinstance(m['value'], (int, float)) and m['value'] > 0
  # The big sections cannot fit the remaining budget on CPU: either the
  # child skipped them with a note, or (when the tiny section itself ran
  # up to the wire, e.g. cold CPU compiles) the parent's deadline kill
  # fired — both are the graceful driver contract, never a timeout rc.
  assert 'SKIP' in r.stderr or 'deadline' in r.stderr, r.stderr
