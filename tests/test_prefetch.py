"""Tests for the async host->device input pipeline (data/prefetch.py)."""

import time

import numpy as np
import pytest

from gencast_tpu.data.prefetch import DevicePrefetcher


def test_order_and_exhaustion():
  src = iter(range(10))
  with DevicePrefetcher(src, transform=lambda x: x * 2) as pf:
    assert list(pf) == [2 * i for i in range(10)]


def test_overlaps_producer_and_consumer():
  """Producer 30ms/batch + consumer 30ms/step must pipeline: wall well
  under the serial sum."""
  n = 8

  def slow_source():
    for i in range(n):
      time.sleep(0.03)
      yield i

  t0 = time.time()
  with DevicePrefetcher(slow_source(), buffer_size=2) as pf:
    out = []
    for x in pf:
      time.sleep(0.03)
      out.append(x)
  wall = time.time() - t0
  assert out == list(range(n))
  serial = n * 0.06
  assert wall < 0.8 * serial, (wall, serial)


def test_exception_propagates():
  def bad_source():
    yield 1
    raise RuntimeError('disk on fire')

  pf = DevicePrefetcher(bad_source())
  assert next(pf) == 1
  with pytest.raises(RuntimeError, match='disk on fire'):
    next(pf)


def test_transform_error_propagates():
  def boom(x):
    raise ValueError('bad pack')

  pf = DevicePrefetcher(iter([1]), transform=boom)
  with pytest.raises(ValueError, match='bad pack'):
    next(pf)


def test_close_midstream_unblocks_producer():
  produced = []

  def source():
    for i in range(1000):
      produced.append(i)
      yield i

  pf = DevicePrefetcher(source(), buffer_size=2)
  assert next(pf) == 0
  pf.close()  # must not hang on a blocked queue.put
  assert len(produced) < 1000
  with pytest.raises(StopIteration):
    next(pf)


def test_device_put_transform():
  """The intended production transform: jnp.asarray on the worker."""
  import jax.numpy as jnp

  batches = [{'x': np.full((4, 4), i, np.float32)} for i in range(3)]
  put = lambda b: {k: jnp.asarray(v) for k, v in b.items()}  # noqa: E731
  with DevicePrefetcher(iter(batches), transform=put) as pf:
    out = list(pf)
  assert len(out) == 3
  assert all(isinstance(b['x'], jnp.ndarray) for b in out)
  np.testing.assert_array_equal(np.asarray(out[2]['x']), batches[2]['x'])
