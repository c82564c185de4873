"""segment ops: uniform-degree dense fast path vs the scatter reference."""

import jax
import jax.numpy as jnp
import numpy as np

from gencast_tpu.ops import segment


def _ref_segment_sum(data, ids, n):
  return jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(ids),
                             num_segments=n)


def test_uniform_degree_detection():
  assert segment._uniform_degree(np.repeat(np.arange(7), 3), 7) == 3
  assert segment._uniform_degree(np.repeat(np.arange(7), 1), 7) == 1
  # Right counts but wrong (interleaved) order must NOT take the fast path.
  assert segment._uniform_degree(np.array([0, 1, 0, 1]), 2) is None
  # Ragged degrees.
  assert segment._uniform_degree(np.array([0, 0, 1, 2, 2, 2]), 3) is None
  # Traced (non-numpy) ids: no static answer.
  assert segment._uniform_degree(jnp.repeat(jnp.arange(7), 3), 7) is None
  assert segment._uniform_degree(np.zeros((0,), np.int32), 4) is None


def test_uniform_segment_sum_matches_scatter():
  rng = np.random.default_rng(0)
  n, k, c = 11, 3, 5
  data = rng.standard_normal((n * k, 2, c)).astype(np.float32)
  ids = np.repeat(np.arange(n), k)
  fast = segment.sorted_segment_sum(jnp.asarray(data), ids, n)
  ref = _ref_segment_sum(data, ids, n)
  np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-6)
  # Normalization still applied on the fast path.
  fast_n = segment.sorted_segment_sum(jnp.asarray(data), ids, n,
                                      normalization=2.0)
  np.testing.assert_allclose(np.asarray(fast_n), np.asarray(ref) / 2.0,
                             rtol=1e-6)


def test_uniform_gather_matches_take_and_grads():
  rng = np.random.default_rng(1)
  n, k, c = 9, 3, 4
  nodes = rng.standard_normal((n, c)).astype(np.float32)
  idx = np.repeat(np.arange(n), k)

  def fast(x):
    return (segment.gather(x, idx) ** 2).sum()

  def ref(x):
    return (jnp.take(x, jnp.asarray(idx), axis=0) ** 2).sum()

  x = jnp.asarray(nodes)
  np.testing.assert_allclose(np.asarray(segment.gather(x, idx)),
                             np.asarray(jnp.take(x, jnp.asarray(idx), 0)))
  g_fast = jax.grad(fast)(x)
  g_ref = jax.grad(ref)(x)
  np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                             rtol=1e-6)


def test_non_uniform_falls_back():
  ids = np.array([0, 0, 1, 3])  # segment 2 empty
  data = jnp.arange(8, dtype=jnp.float32).reshape(4, 2)
  out = segment.sorted_segment_sum(data, ids, 4)
  ref = _ref_segment_sum(data, ids, 4)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
