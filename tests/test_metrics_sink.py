"""Metrics sink: JSONL records, wandb mirroring (scalars AND images via a
fake wandb module), and graceful degradation. Reference role: the wandb
scalar + eval-triptych logging in training/train.py:336-403 /
train_helpers.py:366-391.
"""

import json
import sys
import types

import numpy as np

from gencast_tpu.training.metrics_sink import MetricsSink


class _FakeWandb(types.ModuleType):
  """Captures init/log/Image/finish calls like the wandb scalar+image API."""

  def __init__(self):
    super().__init__('wandb')
    self.inits = []
    self.logs = []
    self.finished = False

  def init(self, project=None, config=None):
    self.inits.append((project, config))

  class Image:
    def __init__(self, path):
      self.path = path

    def __eq__(self, other):
      return isinstance(other, _FakeWandb.Image) and other.path == self.path

  def log(self, values, step=None):
    self.logs.append((step, values))

  def finish(self):
    self.finished = True


def _with_fake_wandb(fn):
  fake = _FakeWandb()
  saved = sys.modules.get('wandb')
  sys.modules['wandb'] = fake
  try:
    fn(fake)
  finally:
    if saved is None:
      del sys.modules['wandb']
    else:
      sys.modules['wandb'] = saved


def test_jsonl_scalars_and_images(tmp_path):
  path = str(tmp_path / 'm.jsonl')
  sink = MetricsSink(path)
  sink.log('train', 10, loss=1.5)
  sink.log_image('sampling_eval', 20, '2m_temperature',
                 str(tmp_path / 'img.png'))
  sink.close()
  with open(path) as f:
    events = [json.loads(l) for l in f]
  assert events[0]['event'] == 'train' and events[0]['loss'] == 1.5
  assert events[1]['image'] == '2m_temperature'
  assert events[1]['path'].endswith('img.png')


def test_wandb_mirroring_scalars_and_images(tmp_path):
  def drive(fake):
    sink = MetricsSink(use_wandb=True, wandb_project='p',
                       run_config={'preset': 'tiny'})
    sink.log('train', 3, loss=0.5, steps_per_sec=10.0)
    sink.log_image('sampling_eval', 7, '2m_temperature', '/tmp/t.png')
    sink.close()
    assert fake.inits == [('p', {'preset': 'tiny'})]
    assert (3, {'train/loss': 0.5, 'train/steps_per_sec': 10.0}) in fake.logs
    assert (7, {'sampling_eval/2m_temperature':
                _FakeWandb.Image('/tmp/t.png')}) in fake.logs
    assert fake.finished

  _with_fake_wandb(drive)


def test_wandb_failure_degrades_to_jsonl(tmp_path, capsys):
  path = str(tmp_path / 'm.jsonl')

  def drive(fake):
    def bad_init(project=None, config=None):
      raise RuntimeError('no network')
    fake.init = bad_init
    sink = MetricsSink(path, use_wandb=True)
    sink.log('train', 1, loss=2.0)
    sink.close()

  _with_fake_wandb(drive)
  assert 'wandb unavailable' in capsys.readouterr().out
  with open(path) as f:
    assert json.loads(f.readline())['loss'] == 2.0


def test_train_sampling_eval_logs_triptych(tmp_path):
  """The production wiring: --do_sampling_eval writes an eval triptych
  PNG and an image record through the sink (train.py:515-529)."""
  from gencast_tpu.training import train

  metrics = str(tmp_path / 'metrics.jsonl')
  train.main(['--preset', 'tiny', '--data', 'synthetic', '--steps', '4',
              '--do_sampling_eval', '--eval_every', '4',
              '--log_every', '2', '--metrics_jsonl', metrics])
  with open(metrics) as f:
    events = [json.loads(l) for l in f]
  imgs = [e for e in events if 'image' in e]
  assert imgs and imgs[0]['event'] == 'sampling_eval'
  import os
  assert os.path.exists(imgs[0]['path'])
  evals = [e for e in events if e['event'] == 'sampling_eval'
           and 'rmse' in e]
  assert evals and np.isfinite(evals[0]['rmse'])
