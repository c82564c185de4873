"""Pallas banded attention vs the XLA triblock oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gencast_tpu.ops import banded_attention as ba


def _reference(q, k, v, mask_blocks, bs):
  """Dense masked attention oracle built from the tri-block mask."""
  b, n, h, d = q.shape
  nb = n // bs
  dense = np.zeros((n, n), dtype=bool)
  m = np.asarray(mask_blocks)
  for j in range(nb):
    dense[j*bs:(j+1)*bs, j*bs:(j+1)*bs] = m[0, j]
    if j + 1 < nb:
      dense[j*bs:(j+1)*bs, (j+1)*bs:(j+2)*bs] = m[1, j]
      dense[(j+1)*bs:(j+2)*bs, j*bs:(j+1)*bs] = m[2, j + 1]
  logits = jnp.einsum('bqhd,bkhd->bhqk', q, k) * d ** -0.5
  logits = jnp.where(jnp.asarray(dense)[None, None], logits, -1e30)
  w = jax.nn.softmax(logits, axis=-1)
  return jnp.einsum('bhqk,bkhd->bqhd', w, v)


def _random_mask(nb, bs, seed, density=0.6):
  rng = np.random.default_rng(seed)
  m = rng.random((3, nb, bs, bs)) < density
  # self-attention always allowed (mesh has self-edges) -> rows never empty.
  for j in range(nb):
    np.fill_diagonal(m[0, j], True)
  # boundary blocks outside the sequence are masked off.
  m[1, nb - 1] = False
  m[2, 0] = False
  return m


@pytest.mark.parametrize("nb,bs,h,d", [(4, 16, 2, 32), (3, 8, 1, 16)])
def test_forward_matches_oracle(nb, bs, h, d):
  n = nb * bs
  key = jax.random.PRNGKey(0)
  kq, kk, kv = jax.random.split(key, 3)
  q = jax.random.normal(kq, (2, n, h, d))
  k = jax.random.normal(kk, (2, n, h, d))
  v = jax.random.normal(kv, (2, n, h, d))
  mask = jnp.asarray(_random_mask(nb, bs, seed=1))

  # Primal path (XLA einsum, used undifferentiated at inference).
  got = ba.banded_attention(q, k, v, mask, bs)
  want = _reference(q, k, v, mask, bs)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=1e-5, rtol=1e-5)
  # AD fwd path (fused Pallas kernel) must match the same oracle.
  got_pallas, _ = jax.vjp(lambda q: ba.banded_attention(q, k, v, mask, bs),
                          q)
  np.testing.assert_allclose(np.asarray(got_pallas), np.asarray(want),
                             atol=1e-5, rtol=1e-5)


def test_fully_masked_rows_zero():
  """Padding rows (no allowed keys at all) must output exactly 0 and get
  zero cotangents — same semantics as ops/sparse_attention.py."""
  nb, bs, h, d = 3, 8, 1, 16
  n = nb * bs
  key = jax.random.PRNGKey(5)
  kq, kk, kv = jax.random.split(key, 3)
  q = jax.random.normal(kq, (1, n, h, d))
  k = jax.random.normal(kk, (1, n, h, d))
  v = jax.random.normal(kv, (1, n, h, d))
  mask = np.asarray(_random_mask(nb, bs, seed=6))
  # Fully mask the last 5 query rows (as both queries and keys), like the
  # hoisted node-axis padding in MeshTransformer.
  pad = 5
  mask[0, nb - 1, bs - pad:, :] = False
  mask[0, nb - 1, :, bs - pad:] = False
  mask[1, nb - 2, :, bs - pad:] = False
  mask[2, nb - 1, bs - pad:, :] = False
  mask = jnp.asarray(mask)

  def f(q, k, v):
    return ba.banded_attention(q, k, v, mask, bs)

  out, vjp = jax.vjp(f, q, k, v)
  assert np.all(np.asarray(out[0, n - pad:]) == 0.0)
  assert np.all(np.isfinite(np.asarray(out)))
  cot = jnp.ones_like(out)
  dq, dk, dv = vjp(cot)
  # Padded query rows contribute nothing to dq; dk/dv see them neither.
  assert np.all(np.asarray(dq[0, n - pad:]) == 0.0)
  for g in (dq, dk, dv):
    assert np.all(np.isfinite(np.asarray(g)))


def test_gradients_match_oracle():
  nb, bs, h, d = 3, 16, 2, 32
  n = nb * bs
  key = jax.random.PRNGKey(2)
  kq, kk, kv, kg = jax.random.split(key, 4)
  q = jax.random.normal(kq, (1, n, h, d))
  k = jax.random.normal(kk, (1, n, h, d))
  v = jax.random.normal(kv, (1, n, h, d))
  cot = jax.random.normal(kg, (1, n, h, d))
  mask = jnp.asarray(_random_mask(nb, bs, seed=3))

  def f_pallas(q, k, v):
    return (ba.banded_attention(q, k, v, mask, bs) * cot).sum()

  def f_ref(q, k, v):
    return (_reference(q, k, v, mask, bs) * cot).sum()

  g_pallas = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
  g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
  for gp, gr, name in zip(g_pallas, g_ref, 'qkv'):
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               atol=2e-5, rtol=2e-5, err_msg=f'd{name}')
