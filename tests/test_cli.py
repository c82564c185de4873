"""End-to-end CLI smoke tests (train -> resume -> evaluate) on tiny configs."""

import json
import os

import pytest


@pytest.mark.parametrize('model', ['gencast', 'graphcast'])
def test_train_and_evaluate_cycle(tmp_path, model):
  from gencast_tpu.training import evaluate, train

  ckpt = str(tmp_path / 'ckpt')
  out = str(tmp_path / 'eval')
  metrics_jsonl = str(tmp_path / 'metrics.jsonl')
  base = ['--model', model, '--preset', 'tiny', '--data', 'synthetic',
          '--log_every', '2']

  train.main(base + ['--steps', '2', '--ckpt_dir', ckpt,
                     '--save_every', '2',
                     '--metrics_jsonl', metrics_jsonl])
  # Metrics sink wrote the step-2 train event.
  with open(metrics_jsonl) as f:
    events = [json.loads(line) for line in f]
  assert events and events[0]['event'] == 'train' and events[0]['step'] == 2
  assert 'loss' in events[0] and 'steps_per_sec' in events[0]
  # Resume.
  train.main(base + ['--steps', '3', '--ckpt_dir', ckpt])

  evaluate.main(['--model', model, '--preset', 'tiny', '--data', 'synthetic',
                 '--ckpt_dir', ckpt, '--max_rollout_steps', '2',
                 '--out_dir', out, '--num_members', '2', '--save_netcdf'])
  with open(os.path.join(out, 'metrics.json')) as f:
    metrics = json.load(f)
  assert 'rmse' in metrics and metrics['steps'] == 2
  assert os.path.exists(os.path.join(out, 'rollout.npz'))
  assert os.path.exists(os.path.join(out, 'triptych_2m_temperature.png'))
  # NetCDF export is designed to skip gracefully without h5py
  # (test_netcdf_writer pins that path); only assert where it can write.
  try:
    import h5py  # noqa: F401
  except ImportError:
    pass
  else:
    assert os.path.exists(os.path.join(out, 'rollout.nc'))


@pytest.mark.slow
def test_evaluate_chunked_paths_match_unchunked(tmp_path):
  """--chunk_size and --member_chunk must reproduce the one-shot rollout
  exactly (same folded member keys, same global step-key split)."""
  import numpy as np

  from gencast_tpu.training import evaluate

  base = ['--preset', 'tiny', '--data', 'synthetic',
          '--max_rollout_steps', '3', '--num_members', '2',
          '--plot_vars']  # no plots: keep the 3 runs fast
  outs = {}
  for name, extra in [('oneshot', []),
                      ('chunked', ['--chunk_size', '1']),
                      ('members', ['--member_chunk', '1'])]:
    out = str(tmp_path / name)
    evaluate.main(base + ['--out_dir', out] + extra)
    outs[name] = np.load(os.path.join(out, 'rollout.npz'))['predictions']
  np.testing.assert_array_equal(outs['oneshot'], outs['chunked'])
  np.testing.assert_array_equal(outs['oneshot'], outs['members'])
