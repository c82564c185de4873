"""Out-of-process batch packing (data/workers.py).

The contract under test: ParallelBatchIterator is a DROP-IN for
sources.batch_iterator — same seed/shuffle/rows semantics, bitwise
identical batches — with the packing moved to worker processes (the
scalable half of the reference's Grain role,
training/era5_dataset.py:797-842).
"""

import functools

import numpy as np
import pytest

from gencast_tpu.data import registry, sources
from gencast_tpu.data.workers import ParallelBatchIterator

TINY_LAT = np.linspace(-88.0, 88.0, 4)
TINY_LON = np.linspace(0.0, 350.0, 8)

# Module-level so the 'spawn' children can unpickle it by reference.
FACTORY = functools.partial(sources.SyntheticSource, registry.GENCAST_TASK,
                            TINY_LAT, TINY_LON, num_times=12, seed=7)


class _BoomSource(sources.SyntheticSource):

  def sample(self, index, num_target_frames=1):
    raise RuntimeError('disk on fire')


BOOM_FACTORY = functools.partial(_BoomSource, registry.GENCAST_TASK,
                                 TINY_LAT, TINY_LON, num_times=12, seed=7)


def test_bitwise_oracle_vs_in_process_iterator():
  """Shuffled, loop=False: every batch of every epoch-slice must equal the
  in-process iterator's bitwise (same permutation stream, same packing)."""
  ref = list(sources.batch_iterator(FACTORY(), 2, shuffle=True, seed=3,
                                    loop=False))
  with ParallelBatchIterator(FACTORY, 2, num_workers=2, shuffle=True,
                             seed=3, loop=False) as it:
    got = list(it)
  assert len(got) == len(ref) and len(ref) > 0
  for b_ref, b_got in zip(ref, got):
    assert set(b_ref) == set(b_got)
    for k in b_ref:
      np.testing.assert_array_equal(b_ref[k], b_got[k])


def test_rows_slicing_and_looping_match():
  """Multi-host rows slicing + loop=True: the worker pool must replicate
  batch_iterator past the first epoch boundary (the permutation stream is
  stateful across epochs)."""
  ref_it = sources.batch_iterator(FACTORY(), 4, shuffle=True, seed=0,
                                  rows=[1, 3])
  n_batches = 8  # > one epoch of 12//4 = 3 batches: crosses reshuffles
  ref = [next(ref_it) for _ in range(n_batches)]
  with ParallelBatchIterator(FACTORY, 4, num_workers=1, shuffle=True,
                             seed=0, rows=[1, 3]) as it:
    got = [next(it) for _ in range(n_batches)]
  for b_ref, b_got in zip(ref, got):
    for k in b_ref:
      np.testing.assert_array_equal(b_ref[k], b_got[k])
  assert got[0]['inputs'].shape[0] == 2  # only the owned rows are packed


def test_multi_frame_windows_do_not_overrun():
  """num_target_frames=K has K-1 fewer valid start indices (a K-frame
  window needs K-1 extra trailing timestamps): a full epoch must pack
  without an end-of-source overrun, and every window carries K frames."""
  n = len(FACTORY())
  with ParallelBatchIterator(FACTORY, 1, num_workers=1, shuffle=False,
                             seed=0, loop=False, num_target_frames=2) as it:
    got = list(it)
  assert len(got) == n - 1
  assert got[0]['targets'].shape[1] == 2


def test_worker_exception_surfaces_and_closes():
  with ParallelBatchIterator(BOOM_FACTORY, 1, num_workers=1) as it:
    with pytest.raises(RuntimeError, match='disk on fire'):
      next(it)
    # The failed pool is shut down; iteration is over, not wedged.
    with pytest.raises(StopIteration):
      next(it)


def test_validation_errors():
  with pytest.raises(ValueError, match='owns no batch rows'):
    ParallelBatchIterator(FACTORY, 2, num_workers=1, rows=[])
  with pytest.raises(ValueError, match='num_workers'):
    ParallelBatchIterator(FACTORY, 2, num_workers=0)
  with pytest.raises(ValueError, match='cannot serve batch_size'):
    ParallelBatchIterator(FACTORY, 999, num_workers=1)
