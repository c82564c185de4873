"""Round-trip tests for the typed npz checkpoint serializer."""

import dataclasses
import io
from typing import Dict, Optional, Tuple

import numpy as np

from gencast_tpu.training import npz_checkpoint as ckpt


@dataclasses.dataclass
class Inner:
  a: np.ndarray
  b: float
  name: str


@dataclasses.dataclass
class Outer:
  inner: Inner
  maybe: Optional[Inner]
  params: Dict[str, np.ndarray]
  levels: Tuple[int, ...]
  flag: bool


def test_roundtrip_typed():
  tree = Outer(
      inner=Inner(a=np.arange(6).reshape(2, 3).astype(np.float32),
                  b=2.5, name='hello'),
      maybe=None,
      params={'w': np.ones((3,)), 'nested': np.zeros((2, 2))},
      levels=(50, 100, 850),
      flag=True)
  buf = io.BytesIO()
  ckpt.dump(buf, tree)
  buf.seek(0)
  out = ckpt.load(buf, Outer)
  assert isinstance(out, Outer)
  np.testing.assert_array_equal(out.inner.a, tree.inner.a)
  assert out.inner.b == 2.5
  assert out.inner.name == 'hello'
  assert out.maybe is None
  np.testing.assert_array_equal(out.params['w'], tree.params['w'])
  assert out.levels == (50, 100, 850)
  assert out.flag is True


def test_roundtrip_untyped_dict():
  tree = {'x': np.arange(4), 'sub': {'y': np.float32(1.5)},
          'lst': [np.ones(2), np.zeros(3)]}
  buf = io.BytesIO()
  ckpt.dump(buf, tree)
  buf.seek(0)
  out = ckpt.load(buf)
  np.testing.assert_array_equal(out['x'], tree['x'])
  np.testing.assert_array_equal(out['sub']['y'], 1.5)
  np.testing.assert_array_equal(out['lst'][0], np.ones(2))
  assert isinstance(out['lst'], list)


def test_optional_present():
  tree = Outer(inner=Inner(a=np.zeros(1), b=0.0, name='x'),
               maybe=Inner(a=np.ones(2), b=1.0, name='y'),
               params={}, levels=(1,), flag=False)
  buf = io.BytesIO()
  ckpt.dump(buf, tree)
  buf.seek(0)
  out = ckpt.load(buf, Outer)
  assert out.maybe is not None and out.maybe.name == 'y'
