"""Block-sparse flash attention (tile plan) vs dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import sparse as sp

from gencast_tpu.ops import sparse_attention as sa


def _random_banded_csr(n, bw, seed, density=0.3):
  rng = np.random.default_rng(seed)
  rows, cols = [], []
  for i in range(n):
    lo, hi = max(0, i - bw), min(n, i + bw + 1)
    cand = np.arange(lo, hi)
    sel = cand[rng.random(cand.size) < density]
    sel = np.union1d(sel, [i])  # self edges always
    rows.extend([i] * len(sel))
    cols.extend(sel.tolist())
  m = sp.csr_matrix((np.ones(len(rows), bool), (rows, cols)), shape=(n, n))
  return m


def _dense_oracle(q, k, v, mask_dense):
  d = q.shape[-1]
  logits = jnp.einsum('bqhd,bkhd->bhqk', q, k) * d ** -0.5
  logits = jnp.where(jnp.asarray(mask_dense)[None, None], logits, -1e30)
  w = jax.nn.softmax(logits, axis=-1)
  return jnp.einsum('bhqk,bkhd->bqhd', w, v)


def _plan_args(plan, fused=True):
  bwd = (jnp.asarray(plan.bwd_q_ids), jnp.asarray(plan.bwd_pair_ids))
  if fused:
    slot, valid = sa.build_bwd_gather(plan)
    bwd = bwd + (jnp.asarray(slot), jnp.asarray(valid))
  return (jnp.asarray(plan.mask_tiles), jnp.asarray(plan.fwd_kv_ids),
          jnp.asarray(plan.fwd_pair_ids), bwd,
          (plan.tile, plan.num_active_fwd, plan.num_active_bwd))


@pytest.mark.parametrize("n,bw,tile", [(96, 20, 16), (128, 40, 32)])
def test_forward_matches_oracle(n, bw, tile):
  csr = _random_banded_csr(n, bw, seed=0)
  plan = sa.build_tile_plan(csr, tile=tile)
  h, d = 2, 32
  key = jax.random.PRNGKey(1)
  kq, kk, kv = jax.random.split(key, 3)
  q = jax.random.normal(kq, (2, n, h, d))
  k = jax.random.normal(kk, (2, n, h, d))
  v = jax.random.normal(kv, (2, n, h, d))
  mt, fi, fp, bw_arrs, meta = _plan_args(plan)
  got = sa.sparse_banded_attention(q, k, v, mt, fi, fp, bw_arrs, meta)
  want = _dense_oracle(q, k, v, csr.toarray())
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=1e-5, rtol=1e-5)


def test_gradients_match_oracle():
  n, bw, tile = 96, 24, 16
  csr = _random_banded_csr(n, bw, seed=2)
  plan = sa.build_tile_plan(csr, tile=tile)
  h, d = 2, 32
  key = jax.random.PRNGKey(3)
  kq, kk, kv, kg = jax.random.split(key, 4)
  q = jax.random.normal(kq, (1, n, h, d))
  k = jax.random.normal(kk, (1, n, h, d))
  v = jax.random.normal(kv, (1, n, h, d))
  cot = jax.random.normal(kg, (1, n, h, d))
  mt, fi, fp, bw_arrs, meta = _plan_args(plan)

  def f_pallas(q, k, v):
    return (sa.sparse_banded_attention(q, k, v, mt, fi, fp, bw_arrs, meta)
            * cot).sum()

  def f_ref(q, k, v):
    return (_dense_oracle(q, k, v, csr.toarray()) * cot).sum()

  gp = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
  gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
  for a, b, name in zip(gp, gr, 'qkv'):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5, err_msg=f'd{name}')


def test_bf16_inputs_match_f32_oracle_loosely():
  """bf16 operands (Bfloat16Cast models) run the MXU at input dtype with
  f32 accumulation; outputs/grads must track the f32 oracle at bf16
  tolerance and keep bf16 dtypes."""
  n, bw, tile = 96, 24, 16
  csr = _random_banded_csr(n, bw, seed=5)
  plan = sa.build_tile_plan(csr, tile=tile)
  h, d = 2, 32
  key = jax.random.PRNGKey(6)
  kq, kk, kv, kg = jax.random.split(key, 4)
  q = jax.random.normal(kq, (1, n, h, d))
  k = jax.random.normal(kk, (1, n, h, d))
  v = jax.random.normal(kv, (1, n, h, d))
  cot = jax.random.normal(kg, (1, n, h, d))
  mt, fi, fp, bw_arrs, meta = _plan_args(plan)

  def run(dtype):
    def f(q, k, v):
      return (sa.sparse_banded_attention(
          q.astype(dtype), k.astype(dtype), v.astype(dtype),
          mt, fi, fp, bw_arrs, meta).astype(jnp.float32) * cot).sum()
    out = sa.sparse_banded_attention(
        q.astype(dtype), k.astype(dtype), v.astype(dtype),
        mt, fi, fp, bw_arrs, meta)
    return out, jax.grad(f, argnums=(0, 1, 2))(q, k, v)

  out16, g16 = run(jnp.bfloat16)
  out32, g32 = run(jnp.float32)
  assert out16.dtype == jnp.bfloat16
  scale = float(jnp.abs(out32).max())
  np.testing.assert_allclose(
      np.asarray(out16, np.float32), np.asarray(out32),
      atol=0.03 * scale, rtol=0.05)
  for a, b, name in zip(g16, g32, 'qkv'):
    s = float(jnp.abs(b).max())
    np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b),
                               atol=0.05 * s, rtol=0.1,
                               err_msg=f'd{name}')


def test_fused_bwd_matches_classic_kernels():
  """The fused two-pass backward (one logits recompute -> dq + dk/dv
  partials + outer gather-reduce) must match the split dq/dkv kernels."""
  n, bw, tile = 128, 40, 32
  csr = _random_banded_csr(n, bw, seed=7)
  plan = sa.build_tile_plan(csr, tile=tile)
  h, d = 4, 32
  key = jax.random.PRNGKey(8)
  kq, kk, kv, kg = jax.random.split(key, 4)
  q = jax.random.normal(kq, (2, n, h, d))
  k = jax.random.normal(kk, (2, n, h, d))
  v = jax.random.normal(kv, (2, n, h, d))
  cot = jax.random.normal(kg, (2, n, h, d))

  def grads(fused):
    mt, fi, fp, bw_arrs, meta = _plan_args(plan, fused=fused)

    def f(q, k, v):
      return (sa.sparse_banded_attention(q, k, v, mt, fi, fp, bw_arrs,
                                         meta) * cot).sum()
    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

  gf = grads(fused=True)
  gc = grads(fused=False)
  for a, b, name in zip(gf, gc, 'qkv'):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5, err_msg=f'd{name}')


def test_plan_skips_empty_tiles():
  """The plan's active count must be well under dense for a sparse band."""
  n, bw, tile = 512, 32, 64
  csr = _random_banded_csr(n, bw, seed=4, density=0.5)
  plan = sa.build_tile_plan(csr, tile=tile)
  assert plan.num_active_fwd < n // tile  # far fewer than dense tiles
  # Every nonzero is covered by some pair tile.
  coo = csr.tocoo()
  covered = set()
  for qi in range(plan.num_q_tiles):
    for a in range(plan.num_active_fwd):
      pid = plan.fwd_pair_ids[qi, a]
      if pid < plan.mask_tiles.shape[0] - 1:
        covered.add((qi, int(plan.fwd_kv_ids[qi, a])))
  for r, c in zip(coo.row, coo.col):
    assert (r // tile, c // tile) in covered


def test_transformer_pallas_backend_matches_triblock():
  """End-to-end: MeshTransformer 'pallas' == 'triblock' with same weights."""
  import flax.nnx as nnx
  from gencast_tpu.graph import compiler
  from gencast_tpu.nn import transformer as tr

  lat = np.arange(-90.0, 90.0 + 1e-6, 15.0, dtype=np.float32)
  lon = np.arange(0.0, 360.0, 15.0, dtype=np.float32)
  statics = compiler.build_graph_statics(2, lat, lon, attention_k_hop=4,
                                         attention_tile_size=32)

  def cfg(attn):
    return tr.TransformerConfig(d_model=32, num_layers=2, num_heads=2,
                                ffw_hidden=64, attention_type=attn,
                                ffw_winit_final_mult=1.0,
                                attn_winit_final_mult=1.0)

  tri = tr.MeshTransformer(cfg('triblock'), statics.attention_mask,
                           rngs=nnx.Rngs(0))
  pal = tr.MeshTransformer(cfg('pallas'), statics.attention_mask,
                           tile_plan=statics.attention_tile_plan,
                           rngs=nnx.Rngs(0))
  n = statics.num_mesh_nodes
  x = jax.random.normal(jax.random.PRNGKey(1), (n, 2, 32))
  cond = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
  np.testing.assert_allclose(np.asarray(pal(x, cond)),
                             np.asarray(tri(x, cond)),
                             atol=2e-5, rtol=2e-5)
