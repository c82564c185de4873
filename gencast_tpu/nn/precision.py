"""bf16 numerics guards.

Softmax (and similar reductions) run in f32 even when activations are bf16.
`reduce_precision` strips excess precision identically in forward and
backward passes so bf16 training gradients stay consistent — the same guard
the reference applies (gencast/sparse_transformer_utils.py:24-76).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def reduce_precision(x, exponent_bits: int, mantissa_bits: int):
  return jax.tree_util.tree_map(
      lambda y: jax.lax.reduce_precision(y, exponent_bits, mantissa_bits), x)


def _reduce_precision_fwd(x, exponent_bits, mantissa_bits):
  return reduce_precision(x, exponent_bits, mantissa_bits), None


def _reduce_precision_bwd(exponent_bits, mantissa_bits, _, dout):
  return (reduce_precision(dout, exponent_bits, mantissa_bits),)


reduce_precision.defvjp(_reduce_precision_fwd, _reduce_precision_bwd)


def with_f32(fn: Callable[[Any], Any], inputs: Any,
             guard_excess_precision: bool = True) -> Any:
  """Runs `fn` on f32-upcast inputs, downcasting the result to the input
  dtype. No-op wrapper when inputs are already f32."""
  leaves = jax.tree_util.tree_leaves(inputs)
  orig_dtype = leaves[0].dtype
  if orig_dtype == jnp.float32:
    return fn(inputs)
  x = jax.tree_util.tree_map(lambda v: v.astype(jnp.float32), inputs)
  if guard_excess_precision:
    finfo = jnp.finfo(orig_dtype)
    x = reduce_precision(x, finfo.nexp, finfo.nmant)
  out = fn(x)
  return jax.tree_util.tree_map(lambda v: v.astype(orig_dtype), out)
