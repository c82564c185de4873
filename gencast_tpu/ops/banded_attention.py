"""Fused banded (tri-block-diagonal) attention — Pallas TPU kernels.

The mesh-node sequence is RCM-banded, so each query block i attends only to
key/value blocks {i-1, i, i+1} under the k-hop mask. This implements the
role the reference delegates to `splash_attention` Pallas kernels
(gencast/sparse_transformer.py:128-159, 402-455), specialized to the banded
structure: instead of a general sparse mask walker, the kernel streams
exactly three K/V blocks per query block. Complexity O(N * 3b * d) with
b = band block size.

Layouts: q, k, v: [B, N, H, d] with N a multiple of the band block size.
The mask is [3, nb, b, b] bool (diag, upper, lower blocks). Overlapping K/V
windows are expressed by passing the zero-block-padded K/V array three times
with shifted BlockSpec index maps — Pallas pipelines each stream
independently, no manual DMA needed.

Forward saves the logsumexp per row; backward is a fused two-kernel pass
(dq in one grid, dk/dv in another) using the standard flash-attention
recomputation identities.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _fwd_kernel(md_ref, mu_ref, ml_ref, q_ref, kd_ref, ku_ref, kl_ref,
                vd_ref, vu_ref, vl_ref, o_ref, lse_ref, *, scale):
  # Matmul operands keep the input dtype (bf16 MXU rate with f32
  # accumulation under Bfloat16Cast; bitwise-identical f32 path
  # otherwise); softmax math runs f32 on the accumulated logits.
  q = q_ref[0]  # [b, d]

  def logits(k_ref, m_ref):
    l = jax.lax.dot_general(q, k_ref[0],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    return jnp.where(m_ref[0, 0] != 0, l, NEG_INF)

  ld = logits(kd_ref, md_ref)
  lu = logits(ku_ref, mu_ref)
  ll = logits(kl_ref, ml_ref)

  m = jnp.maximum(jnp.maximum(ld.max(-1, keepdims=True),
                              lu.max(-1, keepdims=True)),
                  ll.max(-1, keepdims=True))
  ed, eu, el = jnp.exp(ld - m), jnp.exp(lu - m), jnp.exp(ll - m)
  denom = (ed.sum(-1, keepdims=True) + eu.sum(-1, keepdims=True)
           + el.sum(-1, keepdims=True))

  def pv(e, v_ref):
    return jax.lax.dot_general(e.astype(v_ref.dtype), v_ref[0],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

  # Fully-masked (padding) rows: every logit is NEG_INF, so m == NEG_INF
  # and exp(l - m) == 1 for all keys — without the fix the row would be
  # the mean of V. Zero the output and push lse to +inf-like so the
  # backward's exp(logits - lse) underflows to 0 for those rows (same
  # semantics as ops/sparse_attention.py).
  valid = m > NEG_INF * 0.5  # [bs, 1]
  o = (pv(ed, vd_ref) + pv(eu, vu_ref) + pv(el, vl_ref)) / denom
  o_ref[0] = jnp.where(valid, o, 0.0).astype(o_ref.dtype)
  lse_ref[0] = jnp.where(valid, m + jnp.log(denom), -NEG_INF)  # [bs, 1]


def _dq_kernel(md_ref, mu_ref, ml_ref, q_ref, kd_ref, ku_ref, kl_ref,
               vd_ref, vu_ref, vl_ref, do_ref, lse_ref, delta_ref,
               dq_ref, *, scale):
  # Input-dtype matmul operands; see _fwd_kernel.
  q = q_ref[0]
  do = do_ref[0]
  lse = lse_ref[0]     # [bs, 1]
  delta = delta_ref[0]  # [bs, 1]

  dq = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
  for k_ref, v_ref, m_ref in ((kd_ref, vd_ref, md_ref),
                              (ku_ref, vu_ref, mu_ref),
                              (kl_ref, vl_ref, ml_ref)):
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    logits = jnp.where(m_ref[0, 0] != 0, logits, NEG_INF)
    w = jnp.exp(logits - lse)  # [b, b]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = w * (dp - delta)
    dq = dq + jax.lax.dot_general(ds.astype(k.dtype), k,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
  dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(md_ref, ml_ref, mu_ref, k_ref, v_ref, qd_ref, qu_ref,
                ql_ref, dod_ref, dou_ref, dol_ref, lsed_ref, lseu_ref,
                lsel_ref, deltad_ref, deltau_ref, deltal_ref,
                dk_ref, dv_ref, *, scale):
  """Grid cell = one K/V block j; accumulates from q blocks {j-1, j, j+1}.

  Mask block roles relative to kv block j: q block j uses the diagonal
  mask[0][j]; q block j+1 ("upper" query, below j) sees kv j as its LOWER
  neighbor -> mask[2][j+1]; q block j-1 sees kv j as its UPPER neighbor ->
  mask[1][j-1]. The index maps pass exactly those blocks (transposed roles
  are handled by transposing w).
  """
  # Input-dtype matmul operands; see _fwd_kernel.
  k = k_ref[0]
  v = v_ref[0]

  dk = jnp.zeros((k.shape[0], k.shape[1]), jnp.float32)
  dv = jnp.zeros((v.shape[0], v.shape[1]), jnp.float32)
  for q_ref, do_ref, lse_ref, delta_ref, m_ref in (
      (qd_ref, dod_ref, lsed_ref, deltad_ref, md_ref),
      (qu_ref, dou_ref, lseu_ref, deltau_ref, ml_ref),
      (ql_ref, dol_ref, lsel_ref, deltal_ref, mu_ref)):
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]     # [bs, 1]
    delta = delta_ref[0]  # [bs, 1]
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    logits = jnp.where(m_ref[0, 0] != 0, logits, NEG_INF)
    w = jnp.exp(logits - lse)  # [bq, bk]
    dv = dv + jax.lax.dot_general(w.astype(do.dtype), do,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = w * (dp - delta)
    dk = dk + jax.lax.dot_general(ds.astype(q.dtype), q,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
  dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
  dv_ref[0] = dv.astype(dv_ref.dtype)


def _interpret() -> bool:
  """Pallas interpreter mode off-TPU (CPU tests / debugging)."""
  return jax.default_backend() != 'tpu'


def _compiler_params(g: int):
  # 'parallel' over the folded batch*heads axis. The raised vmem cap is
  # conditional: Mosaic's default 16MB scoped budget rejects the unrolled
  # 3-neighbor backward once the folded axis grows (batch >= 2 at 4
  # heads), but raising the cap unconditionally makes Mosaic pick a
  # schedule ~15% slower at batch 1 (measured 18.2 -> 21.3 ms/step).
  if g > 8:
    return pltpu.CompilerParams(
        dimension_semantics=('parallel', 'arbitrary'),
        vmem_limit_bytes=100 * 1024 * 1024)
  return pltpu.CompilerParams(
      dimension_semantics=('parallel', 'arbitrary'))


def _reshape_bhnd(x):
  """[B, N, H, d] -> [B*H, N, d] (fold batch & heads into the grid)."""
  b, n, h, d = x.shape
  return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)


def _unshape_bhnd(x, b, h):
  bh, n, d = x.shape
  return x.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _pad_blocks(x, bs):
  """Add one zero block on each side of the node axis: [G, N+2b, d]."""
  return jnp.pad(x, ((0, 0), (bs, bs), (0, 0)))


def _xla_forward(q, k, v, mask_blocks, block_size):
  """Inference-path tri-block attention: plain XLA einsums, no lse.

  Same math and masked-row semantics as the Pallas kernels, but cheaper
  when nothing is differentiated (the fused kernel always computes and
  writes the logsumexp rows its backward needs; XLA's fwd-only fusion of
  the 3-block softmax beats that by ~0.4 ms on the nano denoiser, and the
  sampler runs 39 undifferentiated forwards per forecast step)."""
  b, n, h, d = q.shape
  bs = block_size
  nb = n // bs
  scale = d ** -0.5
  blk = lambda t: t.reshape(b, nb, bs, h, d)
  qb, kb, vb = blk(q), blk(k), blk(v)
  zero = lambda t: jnp.zeros_like(t[:, :1])
  kp = jnp.concatenate([zero(kb), kb, zero(kb)], axis=1)
  vp = jnp.concatenate([zero(vb), vb, zero(vb)], axis=1)

  def qk(keys):
    return scale * jnp.einsum('bnqhd,bnkhd->bnhqk', qb, keys,
                              preferred_element_type=jnp.float32)

  logits = [jnp.where(mask_blocks[i][None, :, None] != 0, qk(kk), NEG_INF)
            for i, kk in ((0, kp[:, 1:-1]), (1, kp[:, 2:]),
                          (2, kp[:, :-2]))]
  m = jnp.maximum(jnp.maximum(logits[0].max(-1, keepdims=True),
                              logits[1].max(-1, keepdims=True)),
                  logits[2].max(-1, keepdims=True))
  exps = [jnp.exp(l - m) for l in logits]
  denom = sum(e.sum(-1, keepdims=True) for e in exps)

  def av(e, values):
    return jnp.einsum('bnhqk,bnkhd->bnqhd', e, values,
                      preferred_element_type=jnp.float32)

  # av output is [b, nb, q, h, d]; denom/valid are [b, nb, h, q, 1].
  o = (av(exps[0], vp[:, 1:-1]) + av(exps[1], vp[:, 2:])
       + av(exps[2], vp[:, :-2])) / denom.transpose(0, 1, 3, 2, 4)
  # Fully-masked (padding) rows output exactly 0, like the kernels.
  valid = (m > NEG_INF * 0.5).transpose(0, 1, 3, 2, 4)
  o = jnp.where(valid, o, 0.0)
  return o.reshape(b, n, h, d).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def banded_attention(q, k, v, mask_blocks, block_size):
  """Tri-block-banded attention.

  q/k/v: [B, N, H, d], N divisible by block_size; mask_blocks:
  [3, nb, bs, bs] uint8 (bool also accepted — uint8 keeps the VMEM mask
  streams 4x smaller than the i32 bools lower to). Returns [B, N, H, d].

  Undifferentiated calls (sampling/inference) take the lse-free XLA
  einsum path; under AD the custom-vjp fwd/bwd rules run the fused Pallas
  kernels (flash-style softmax + two-kernel backward).
  """
  return _xla_forward(q, k, v, mask_blocks, block_size)


def _banded_attention_fwd_impl(q, k, v, mask_blocks, block_size):
  b, n, h, d = q.shape
  bs = block_size
  assert n % bs == 0, (n, bs)
  nb = n // bs
  scale = d ** -0.5

  qf = _reshape_bhnd(q)      # [G, N, d]
  kf = _pad_blocks(_reshape_bhnd(k), bs)  # [G, N+2b, d]
  vf = _pad_blocks(_reshape_bhnd(v), bs)
  g = qf.shape[0]

  # Mask streams: same array three ways (diag/upper/lower block per j).
  def mspec(part):
    return pl.BlockSpec((1, 1, bs, bs), lambda gi, j: (part, j, 0, 0),
                        memory_space=pltpu.VMEM)

  def qspec():
    return pl.BlockSpec((1, bs, d), lambda gi, j: (gi, j, 0),
                        memory_space=pltpu.VMEM)

  def kvspec(shift):
    # padded array: block j+shift in units of bs (shift 1 = diagonal).
    return pl.BlockSpec((1, bs, d), lambda gi, j, s=shift: (gi, j + s, 0),
                        memory_space=pltpu.VMEM)

  o, lse = pl.pallas_call(
      functools.partial(_fwd_kernel, scale=scale),
      grid=(g, nb),
      in_specs=[mspec(0), mspec(1), mspec(2),
                qspec(),
                kvspec(1), kvspec(2), kvspec(0),
                kvspec(1), kvspec(2), kvspec(0)],
      out_specs=[
          pl.BlockSpec((1, bs, d), lambda gi, j: (gi, j, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, bs, 1), lambda gi, j: (gi, j, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((g, n, d), q.dtype),
          jax.ShapeDtypeStruct((g, n, 1), jnp.float32),
      ],
      compiler_params=_compiler_params(g),
      interpret=_interpret(),
  )(mask_blocks, mask_blocks, mask_blocks, qf, kf, kf, kf, vf, vf, vf)

  return _unshape_bhnd(o, b, h), (qf, kf, vf, lse)


def _banded_attention_fwd(q, k, v, mask_blocks, block_size):
  o, (qf, kf, vf, lse) = _banded_attention_fwd_impl(q, k, v, mask_blocks,
                                                    block_size)
  return o, (qf, kf, vf, lse, o, mask_blocks, q.shape)


def _banded_attention_bwd(block_size, res, do):
  qf, kf, vf, lse, o, mask_blocks, qshape = res
  b, n, h, d = qshape
  bs = block_size
  nb = n // bs
  scale = d ** -0.5
  g = qf.shape[0]

  dof = _reshape_bhnd(do)
  of = _reshape_bhnd(o)
  delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                  axis=-1, keepdims=True)  # [G, N, 1]

  def mspec(part, shift=0):
    return pl.BlockSpec((1, 1, bs, bs),
                        lambda gi, j, p=part, s=shift: (p, j + s, 0, 0),
                        memory_space=pltpu.VMEM)

  def nspec(shift=0, padded=False):
    return pl.BlockSpec((1, bs, d),
                        lambda gi, j, s=shift: (gi, j + s, 0),
                        memory_space=pltpu.VMEM)

  def vecspec(shift=0):
    return pl.BlockSpec((1, bs, 1), lambda gi, j, s=shift: (gi, j + s, 0),
                        memory_space=pltpu.VMEM)

  # --- dq ---
  dqf = pl.pallas_call(
      functools.partial(_dq_kernel, scale=scale),
      grid=(g, nb),
      in_specs=[mspec(0), mspec(1), mspec(2),
                nspec(),
                nspec(1), nspec(2), nspec(0),
                nspec(1), nspec(2), nspec(0),
                nspec(), vecspec(), vecspec()],
      out_specs=pl.BlockSpec((1, bs, d), lambda gi, j: (gi, j, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((g, n, d), qf.dtype),
      compiler_params=_compiler_params(g),
      interpret=_interpret(),
  )(mask_blocks, mask_blocks, mask_blocks, qf, kf, kf, kf, vf, vf, vf,
    dof, lse, delta)

  # --- dk, dv --- (grid over kv blocks; pad q-side streams by one block)
  qp = _pad_blocks(qf, bs)
  dop = _pad_blocks(dof, bs)
  lsep = jnp.pad(lse, ((0, 0), (bs, bs), (0, 0)))
  deltap = jnp.pad(delta, ((0, 0), (bs, bs), (0, 0)))
  # Mask padded along the block axis so q-block j-1 / j+1 reads stay in
  # range; padded blocks are all-False = fully masked.
  mp = jnp.pad(mask_blocks, ((0, 0), (1, 1), (0, 0), (0, 0)))

  dkf, dvf = pl.pallas_call(
      functools.partial(_dkv_kernel, scale=scale),
      grid=(g, nb),
      in_specs=[
          mspec(0, shift=1),   # diag mask of q block j
          mspec(2, shift=2),   # lower mask of q block j+1 (kv j is its lower)
          mspec(1, shift=0),   # upper mask of q block j-1 (kv j is its upper)
          nspec(1), nspec(1),  # k, v block j (unpadded arrays, shift for pad)
          nspec(1), nspec(2), nspec(0),       # q blocks j, j+1, j-1 (padded)
          nspec(1), nspec(2), nspec(0),       # do blocks
          vecspec(1), vecspec(2), vecspec(0),  # lse blocks
          vecspec(1), vecspec(2), vecspec(0),  # delta blocks
      ],
      out_specs=[
          pl.BlockSpec((1, bs, d), lambda gi, j: (gi, j + 1, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, bs, d), lambda gi, j: (gi, j + 1, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct(kf.shape, kf.dtype),
          jax.ShapeDtypeStruct(vf.shape, vf.dtype),
      ],
      compiler_params=_compiler_params(g),
      interpret=_interpret(),
  )(mp, mp, mp, kf, vf, qp, qp, qp, dop, dop, dop,
    lsep, lsep, lsep, deltap, deltap, deltap)

  dq = _unshape_bhnd(dqf, b, h)
  dk = _unshape_bhnd(dkf[:, bs:-bs], b, h)
  dv = _unshape_bhnd(dvf[:, bs:-bs], b, h)
  return dq, dk, dv, None


banded_attention.defvjp(_banded_attention_fwd, _banded_attention_bwd)
