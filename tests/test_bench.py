"""Driver-contract smoke for bench.py: it must emit metric JSON lines and
exit 0 within a wall-clock budget, skipping sections that do not fit
(round-2 regression: the driver's bench run timed out inside the 0.25-deg
section and the whole artifact landed as rc=124 with no qdeg metric).

Two cheap runs instead of one expensive one (ADVICE r3: the old
'tiny,nano,onedeg,qdeg' run burned the full 240s budget compiling nano/
onedeg sections it then deadline-killed): a tiny-only run pins the JSON
contract, and a near-zero-budget run pins the graceful-skip contract
without compiling anything.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(sections: str, budget: str, timeout: int):
  env = dict(os.environ)
  env.update(BENCH_CPU='1', BENCH_SECTIONS=sections, BENCH_BUDGET_S=budget)
  return subprocess.run([sys.executable, os.path.join(REPO, 'bench.py')],
                        capture_output=True, text=True, env=env, cwd=REPO,
                        timeout=timeout)


def test_bench_json_contract():
  r = _run('tiny', budget='240', timeout=300)
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
  # The parent's final line is a compact recap of every landed metric
  # (the driver keeps only the last ~2000 chars of output, so the full
  # metric set must survive in one trailing line).
  parsed = [json.loads(l) for l in lines]
  recap = [m for m in parsed if m['metric'] == 'bench_recap']
  assert len(recap) == 1 and parsed[-1]['metric'] == 'bench_recap'
  others = {m['metric'] for m in parsed} - {'bench_recap'}
  assert set(recap[0]['metrics']) == others
  assert recap[0]['value'] == len(others)


def test_bench_budget_guard_skips_gracefully():
  """A budget below the parent's 20s group floor must skip every section
  up front (no model build, no compile) and still exit 0."""
  r = _run('tiny,nano,onedeg,qdeg', budget='15', timeout=60)
  assert r.returncode == 0, f'STDOUT:\n{r.stdout}\nSTDERR:\n{r.stderr}'
  assert 'SKIP' in r.stderr, r.stderr
  assert not [l for l in r.stdout.splitlines() if l.startswith('{')]


def test_bench_graphcast_predict_section_runs_on_cpu():
  """Pins the graphcast_onedeg_predict plumbing (build_graphcast +
  Bfloat16Cast.predict + rollout_maps frame advance through the
  differenced fused-rollout timing) at the tiny CPU scale."""
  r = _run('tiny_graphcast_predict', budget='240', timeout=300)
  assert r.returncode == 0, f'STDOUT:\n{r.stdout}\nSTDERR:\n{r.stderr}'
  lines = [json.loads(l) for l in r.stdout.splitlines() if l.startswith('{')]
  if 'deadline' not in r.stderr:
    assert [m for m in lines
            if m['metric'] == 'tiny_graphcast_predict_ms'], r.stdout


def test_bench_graphcast_section_runs_on_cpu():
  """Pins the builder= plumbing through bench_model (build_graphcast +
  find_layout_provider + GraphCast.loss through the chained train scan):
  a breakage here would otherwise only surface as a silently-skipped
  section in the next real-chip bench pass, costing a round's metric."""
  r = _run('tiny_graphcast', budget='240', timeout=300)
  assert r.returncode == 0, f'STDOUT:\n{r.stdout}\nSTDERR:\n{r.stderr}'
  lines = [json.loads(l) for l in r.stdout.splitlines() if l.startswith('{')]
  if 'deadline' not in r.stderr:
    assert [m for m in lines
            if m['metric'] == 'tiny_graphcast_train_step_ms'], r.stdout
