"""Edge -> node aggregation over static, receiver-sorted edge lists.

The graph compiler sorts every edge set by receiver, so aggregation is a
sorted segment-sum — XLA lowers this to an efficient one-pass scatter-add,
and `indices_are_sorted=True` lets it skip the sort/dedup machinery.
Replaces jraph.segment_sum usage in the reference
(common/typed_graph_net.py:62-64, 173, 182).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sorted_segment_sum(
    data: jnp.ndarray,          # [E, ...]
    segment_ids: jnp.ndarray,   # [E] ascending
    num_segments: int,
    f32_accumulate: bool = False,
    normalization: Optional[float] = None,
) -> jnp.ndarray:
  """Sum of `data` rows per receiver segment, shape [num_segments, ...].

  f32_accumulate upcasts bf16 messages to f32 for the reduction and casts
  back (the reference's f32_aggregation,
  common/deep_typed_graph_net.py:396-404).
  """
  dtype = data.dtype
  if f32_accumulate and dtype != jnp.float32:
    data = data.astype(jnp.float32)
  out = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                            indices_are_sorted=True)
  if normalization is not None:
    out = out / normalization
  if f32_accumulate and dtype != jnp.float32:
    out = out.astype(dtype)
  return out


def gather(nodes: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
  """nodes[indices] along the leading axis; [N, ...] -> [E, ...]."""
  return jnp.take(nodes, indices, axis=0, indices_are_sorted=False,
                  unique_indices=False)
