"""Fused LayerNorm + FiLM with a single-pass Pallas backward — TPU.

Every GNN update function in GenCast ends with
``LayerNorm(no scale/bias) -> x * scale + offset`` where scale/offset come
from the noise-level conditioning vector (reference common/mlp.py:68-147).
At edge scale (hundreds of thousands to millions of rows x 512 channels)
the BACKWARD of that pair is pure HBM roofline: XLA materializes x_hat and
runs separate reduce fusions for d_scale = sum_rows(dy * x_hat) and
d_offset = sum_rows(dy) on top of the dx fusion — several full passes over
[rows, C] arrays (profiled: the 1-degree train step's ~50 ms GNN tail is
dominated by exactly these edge-scale LayerNorm/FiLM/bias reductions).

This op keeps the forward as plain XLA (it fuses fine, and undifferentiated
sampler calls stay on the cheapest path) but gives the pair ONE custom-vjp
boundary whose backward is a single Pallas kernel: each [rows, C] tile of
x and dy is read once, the kernel recomputes mean/rstd on the VPU, and
emits dx plus the dscale/doffset row-sum accumulators without any
intermediate HBM round-trips. 3 array passes total (read x, read dy,
write dx) vs XLA's 5+.

Gradient identities (LN over the last axis, eps inside the sqrt):
  x_hat = (x - mu) * rstd,    y = x_hat * scale + offset
  doffset = sum_rows(dy)                      [per batch element]
  dscale  = sum_rows(dy * x_hat)              [per batch element]
  g  = dy * scale
  dx = rstd * (g - mean_C(g) - x_hat * mean_C(g * x_hat))

Layouts: rows-leading [R, B, C] (GNN convention) and batch-leading
[B, R, C] (transformer convention) are both supported; scale/offset are
[B, C]. All reductions accumulate in f32 regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6  # nnx.LayerNorm default, matches CondMLP's layer_norm.


def _interpret() -> bool:
  return jax.default_backend() != 'tpu'


def _ln(x32, eps):
  # Fast variance (E[x^2] - E[x]^2), matching flax's LayerNorm default:
  # both moments come from ONE pass over x — the (x - mu)^2 form needs a
  # second, and that extra edge-scale read measured a 3% sampler tax.
  mu = jnp.mean(x32, axis=-1, keepdims=True)
  var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
  rstd = jax.lax.rsqrt(var + eps)
  return (x32 - mu) * rstd


def ln_film_reference(x, scale, offset, eps: float = _EPS):
  """Pure-XLA forward (and the numerics oracle for the fused backward).

  x: [R, B, C] or [B, R, C]; scale/offset: [B, C] broadcast over the row
  axis (the caller disambiguates layout via `batch_axis` in `ln_film`).
  Replicates the unfused composition's op order exactly — f32 LN stats
  (like flax), cast back to x.dtype, FiLM multiply in the input dtype —
  so undifferentiated callers (the sampler's 39 denoiser forwards per
  step) compile to the same program whether or not the fused op is on
  (a f32-multiply variant measured a 2% sampler tax at 1 degree).
  """
  x_hat = _ln(x.astype(jnp.float32), eps).astype(x.dtype)
  return x_hat * scale.astype(x.dtype) + offset.astype(x.dtype)


def _bwd_kernel(x_ref, dy_ref, scale_ref, dx_ref, dsc_ref, doff_ref, *,
                eps, rows, tile):
  """Grid (B, ceil(R/tile)); blocks are [tile, C] row slabs of one batch
  element. dscale/doffset blocks revisit the same [1, C] slot across the
  row axis and accumulate in place (f32)."""
  r = pl.program_id(1)

  # Ragged final tile: zero out-of-range rows BEFORE any math so garbage
  # reads can't poison the accumulators (0-rows give rstd = 1/sqrt(eps),
  # finite, and contribute exactly 0 everywhere).
  rows_left = rows - r * tile
  valid = (jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) < rows_left)
  x = jnp.where(valid, x_ref[0].astype(jnp.float32), 0.0)
  dy = jnp.where(valid, dy_ref[0].astype(jnp.float32), 0.0)
  scale = scale_ref[0].astype(jnp.float32)  # [1, C]

  mu = jnp.mean(x, axis=-1, keepdims=True)
  var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
  rstd = jax.lax.rsqrt(var + eps)
  x_hat = (x - mu) * rstd
  g = dy * scale
  m1 = jnp.mean(g, axis=-1, keepdims=True)
  m2 = jnp.mean(g * x_hat, axis=-1, keepdims=True)
  dx_ref[0] = (rstd * (g - m1 - x_hat * m2)).astype(dx_ref.dtype)

  dsc = jnp.sum(dy * x_hat, axis=0, keepdims=True)   # [1, C]
  doff = jnp.sum(dy, axis=0, keepdims=True)

  @pl.when(r == 0)
  def _init():
    dsc_ref[0] = dsc
    doff_ref[0] = doff

  @pl.when(r != 0)
  def _acc():
    dsc_ref[0] += dsc
    doff_ref[0] += doff


def _bwd_pallas(xb, dyb, scale, eps, tile):
  """xb/dyb: [B, R, C] batch-leading. Returns (dxb, dscale, doffset)."""
  b, r, c = xb.shape
  nr = -(-r // tile)

  row_spec = pl.BlockSpec((1, tile, c), lambda bi, ri: (bi, ri, 0),
                          memory_space=pltpu.VMEM)
  acc_spec = pl.BlockSpec((1, 1, c), lambda bi, ri: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
  dx, dsc, doff = pl.pallas_call(
      functools.partial(_bwd_kernel, eps=eps, rows=r, tile=tile),
      grid=(b, nr),
      in_specs=[row_spec, row_spec,
                pl.BlockSpec((1, 1, c), lambda bi, ri: (bi, 0, 0),
                             memory_space=pltpu.VMEM)],
      out_specs=[row_spec, acc_spec, acc_spec],
      out_shape=[
          jax.ShapeDtypeStruct(xb.shape, xb.dtype),
          jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
          jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
      ],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel', 'arbitrary')),
      interpret=_interpret(),
  )(xb, dyb, scale[:, None, :])
  return dx, dsc[:, 0], doff[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ln_film(x, scale, offset, batch_axis: int = 1, eps: float = _EPS):
  """LayerNorm (no learned scale/bias) followed by FiLM, fused backward.

  x: rank-3 activations; `batch_axis` in {0, 1} says which axis matches
  scale/offset's leading [B] axis (1 = the GNN's [R, B, C] layout, 0 = the
  transformer's [B, N, C]). scale is the FULL multiplier (caller adds the
  +1 of the reference's scale_minus_one convention before the call).
  """
  sh = (1, scale.shape[0], scale.shape[1]) if batch_axis == 1 else \
       (scale.shape[0], 1, scale.shape[1])
  return ln_film_reference(x, scale.reshape(sh), offset.reshape(sh), eps)


def _ln_film_fwd(x, scale, offset, batch_axis, eps):
  return ln_film(x, scale, offset, batch_axis, eps), (x, scale)


def _ln_film_bwd(batch_axis, eps, res, dy):
  x, scale = res
  if batch_axis == 1:                      # [R, B, C] rows-leading
    r, b, c = x.shape
    if b == 1:
      xb = x.reshape(1, r, c)
      dyb = dy.reshape(1, r, c)
    else:
      xb = x.transpose(1, 0, 2)
      dyb = dy.transpose(1, 0, 2)
  else:                                    # [B, R, C] batch-leading
    xb, dyb = x, dy
  tile = _pick_tile(xb.shape[1], xb.shape[2])
  dxb, dscale, doffset = _bwd_pallas(xb, dyb, scale, eps, tile)
  if batch_axis == 1:
    dx = dxb.reshape(x.shape) if x.shape[1] == 1 else dxb.transpose(1, 0, 2)
  else:
    dx = dxb
  return dx, dscale.astype(scale.dtype), doffset.astype(scale.dtype)


def _pick_tile(rows: int, c: int, vmem_budget: int = 8 * 1024 * 1024) -> int:
  """Largest power-of-two row tile whose working set (x, dy f32 copies +
  dx out + slack) stays well inside VMEM."""
  tile = 2048
  while tile > 8 and tile * c * 4 * 3 > vmem_budget:
    tile //= 2
  return min(tile, max(8, rows))


ln_film.defvjp(_ln_film_fwd, _ln_film_bwd)


def enabled(x, num_batch: int, batch_axis: int) -> bool:
  """Whether to take the fused path for these operands.

  Defaults: on for the TPU backend when the channel axis is lane-aligned
  and the row count is large enough to beat a kernel launch; off
  elsewhere (the CPU parity/convergence tests keep flax's exact op
  order). GENCAST_FUSED_LN_FILM=1 forces it on (interpret mode off-TPU,
  used by the equivalence tests); =0 forces it off.
  """
  import os
  flag = os.environ.get('GENCAST_FUSED_LN_FILM')
  if flag == '0':
    return False
  ok_shape = (x.ndim == 3 and x.shape[-1] % 128 == 0
              and x.shape[batch_axis] == num_batch)
  if not ok_shape:
    return False
  if flag == '1':
    return True
  rows = x.shape[1 - batch_axis]
  return jax.default_backend() == 'tpu' and rows >= 4096
