"""Fused LayerNorm+FiLM (ops/ln_film.py) vs the unfused flax composition.

The fused op must match the reference composition (nnx.LayerNorm without
scale/bias, then FiLM) in outputs AND in gradients wrt activations, the
FiLM scale/offset, and (through the FiLM linear) the conditioning vector.
Runs the Pallas backward in interpret mode on CPU.
"""

import os

import flax.nnx as nnx
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gencast_tpu.nn import mlp as mlp_lib
from gencast_tpu.ops import ln_film as lf


def _unfused(x, scale, offset, batch_axis):
  sh = ((1, scale.shape[0], scale.shape[1]) if batch_axis == 1
        else (scale.shape[0], 1, scale.shape[1]))
  ln = nnx.LayerNorm(x.shape[-1], use_scale=False, use_bias=False,
                     rngs=nnx.Rngs(0))
  return ln(x) * scale.reshape(sh) + offset.reshape(sh)


@pytest.mark.parametrize('batch_axis', [0, 1])
@pytest.mark.parametrize('b', [1, 3])
@pytest.mark.parametrize('rows', [96, 100])  # divisible and ragged tiles
def test_op_matches_unfused(batch_axis, b, rows):
  c = 128
  key = jax.random.PRNGKey(0)
  kx, ks, ko = jax.random.split(key, 3)
  shape = (rows, b, c) if batch_axis == 1 else (b, rows, c)
  x = jax.random.normal(kx, shape, jnp.float32) * 2.0 + 0.3
  scale = jax.random.normal(ks, (b, c), jnp.float32) * 0.1 + 1.0
  offset = jax.random.normal(ko, (b, c), jnp.float32) * 0.1

  out = lf.ln_film(x, scale, offset, batch_axis)
  ref = _unfused(x, scale, offset, batch_axis)
  np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

  def loss_fused(x, s, o):
    w = jnp.arange(x.size, dtype=jnp.float32).reshape(x.shape) / x.size
    return jnp.sum(lf.ln_film(x, s, o, batch_axis) * w)

  def loss_ref(x, s, o):
    w = jnp.arange(x.size, dtype=jnp.float32).reshape(x.shape) / x.size
    return jnp.sum(_unfused(x, s, o, batch_axis) * w)

  g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, offset)
  g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, offset)
  for gf, gr, name in zip(g_fused, g_ref, ('dx', 'dscale', 'doffset')):
    np.testing.assert_allclose(gf, gr, rtol=3e-4, atol=3e-5, err_msg=name)


def test_op_bf16_matches_f32_math():
  rows, b, c = 64, 1, 256
  key = jax.random.PRNGKey(1)
  kx, ks, ko = jax.random.split(key, 3)
  x = (jax.random.normal(kx, (rows, b, c)) * 2).astype(jnp.bfloat16)
  scale = (1 + 0.1 * jax.random.normal(ks, (b, c))).astype(jnp.bfloat16)
  offset = (0.1 * jax.random.normal(ko, (b, c))).astype(jnp.bfloat16)
  out = lf.ln_film(x, scale, offset, 1)
  assert out.dtype == jnp.bfloat16
  ref = lf.ln_film_reference(
      x.astype(jnp.float32), scale.astype(jnp.float32)[None],
      offset.astype(jnp.float32)[None])
  np.testing.assert_allclose(out.astype(np.float32), ref, rtol=2e-2,
                             atol=2e-2)
  g = jax.grad(lambda q: lf.ln_film(q, scale, offset, 1)
               .astype(jnp.float32).sum())(x)
  assert g.dtype == jnp.bfloat16
  assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_condmlp_fused_path_matches(monkeypatch):
  """CondMLP output+grads with the fused path forced on == forced off."""
  rows, b, d_in, c = 100, 2, 32, 128
  rngs = nnx.Rngs(0)
  m = mlp_lib.CondMLP(d_in, c, 1, c, jax.nn.silu, use_layer_norm=True,
                      use_norm_conditioning=True, rngs=rngs)
  x = jax.random.normal(jax.random.PRNGKey(2), (rows, b, d_in))
  cond = jax.random.normal(jax.random.PRNGKey(3), (b, 16))

  def run_and_grads():
    def loss(model):
      return jnp.sum(model(x, cond) ** 2)
    val, grads = nnx.value_and_grad(loss)(m)
    return val, m(x, cond), jax.tree.leaves(grads)

  monkeypatch.setenv('GENCAST_FUSED_LN_FILM', '0')
  v_off, y_off, g_off = run_and_grads()
  monkeypatch.setenv('GENCAST_FUSED_LN_FILM', '1')
  v_on, y_on, g_on = run_and_grads()

  # Forwards agree to f32 noise (flax's fast-variance LN vs the fused
  # op's two-pass stats); the upstream dy = 2y therefore differs at the
  # same level between the two paths, so gradient agreement is bounded
  # by that forward noise, not by the kernel (the op-level tests above
  # compare with IDENTICAL dy and hold at 3e-4).
  np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                             atol=5e-6)
  np.testing.assert_allclose(v_on, v_off, rtol=1e-5)
  assert len(g_on) == len(g_off)
  for a, bb in zip(g_on, g_off):
    a, bb = np.asarray(a), np.asarray(bb)
    scale = np.max(np.abs(bb)) + 1e-12
    np.testing.assert_allclose(a / scale, bb / scale, atol=3e-2)


def test_enabled_gating(monkeypatch):
  x3 = jnp.zeros((100, 2, 128))
  monkeypatch.delenv('GENCAST_FUSED_LN_FILM', raising=False)
  # CPU backend: off unless forced.
  assert not lf.enabled(x3, 2, 1)
  monkeypatch.setenv('GENCAST_FUSED_LN_FILM', '1')
  assert lf.enabled(x3, 2, 1)
  assert not lf.enabled(jnp.zeros((100, 2, 130)), 2, 1)  # lane-unaligned
  assert not lf.enabled(jnp.zeros((100, 128)), 2, 1)     # rank 2
  monkeypatch.setenv('GENCAST_FUSED_LN_FILM', '0')
  assert not lf.enabled(x3, 2, 1)
