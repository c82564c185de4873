"""Tests for the GraphCast deterministic model + multi-step AR training."""

import flax.nnx as nnx
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gencast_tpu.data import layout as L
from gencast_tpu.data import registry
from gencast_tpu.graph import compiler
from gencast_tpu.models import graphcast as gc
from gencast_tpu.models import wrappers
from gencast_tpu import rollout as R

TINY_GC_TASK = registry.TaskSpec(
    input_variables=('2m_temperature', 'temperature',
                     'toa_incident_solar_radiation', 'year_progress_sin',
                     'land_sea_mask'),
    target_variables=('2m_temperature', 'temperature'),
    forcing_variables=('toa_incident_solar_radiation', 'year_progress_sin'),
    pressure_levels=(500, 1000),
    num_input_frames=2,
)


@pytest.fixture(scope="module")
def setup():
  lat = np.arange(-90.0, 90.0 + 1e-6, 30.0, dtype=np.float32)
  lon = np.arange(0.0, 360.0, 30.0, dtype=np.float32)
  statics = compiler.build_graph_statics(
      2, lat, lon, build_attention_mask=False, build_multimesh=True)
  model = gc.GraphCast(
      TINY_GC_TASK, statics,
      gc.GraphCastConfig(latent_size=32, gnn_msg_steps=3),
      rngs=nnx.Rngs(0))
  return statics, model


def _data(statics, task, batch=2, seed=0, k_steps=1):
  rng = np.random.default_rng(seed)
  nlat, nlon = statics.grid_lat.shape[0], statics.grid_lon.shape[0]
  inp = L.build_layout(task.input_variables, task.pressure_levels, 2)
  tgt = L.build_layout(task.target_variables, task.pressure_levels, 1)
  frc = L.build_layout(task.forcing_variables, task.pressure_levels, 1)
  def r(shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)
  if k_steps == 1:
    return (r((batch, nlat, nlon, inp.num_channels)),
            r((batch, nlat, nlon, tgt.num_channels)),
            r((batch, nlat, nlon, frc.num_channels)))
  return (r((batch, nlat, nlon, inp.num_channels)),
          r((k_steps, batch, nlat, nlon, tgt.num_channels)),
          r((k_steps, batch, nlat, nlon, frc.num_channels)))


def test_multimesh_statics(setup):
  statics, _ = setup
  mm = statics.multimesh_edges
  # Multimesh edge count = sum over levels of 3 * 20 * 4^s.
  assert mm.num_edges == sum(3 * 20 * 4 ** s for s in range(3))
  assert mm.senders.max() < statics.num_mesh_nodes


def test_forward_and_loss(setup):
  statics, model = setup
  inputs, targets, forcings = _data(statics, TINY_GC_TASK)
  preds = model.predict(inputs, forcings)
  assert preds.shape == targets.shape
  assert bool(jnp.isfinite(preds).all())
  # Deterministic.
  np.testing.assert_array_equal(np.asarray(preds),
                                np.asarray(model.predict(inputs, forcings)))

  def loss_fn(m):
    loss, _ = m.loss(inputs, targets, forcings)
    return loss.mean()

  loss, grads = nnx.value_and_grad(loss_fn)(model)
  assert np.isfinite(float(loss))
  assert all(bool(jnp.isfinite(g).all())
             for g in jax.tree_util.tree_leaves(grads))


def test_m2g_edge_normalization_factor(setup):
  """The knob changes predictions (reference graphcast.py:327-328,583);
  passing the compiler's own max-length factor reproduces the default."""
  statics, model = setup
  inputs, _, forcings = _data(statics, TINY_GC_TASK, batch=1)
  base = model.predict(inputs, forcings)

  scaled = gc.GraphCast(
      TINY_GC_TASK, statics,
      gc.GraphCastConfig(latent_size=32, gnn_msg_steps=3,
                         mesh2grid_edge_normalization_factor=0.1),
      rngs=nnx.Rngs(0))
  out = scaled.predict(inputs, forcings)
  assert float(jnp.abs(out - base).max()) > 1e-6

  # Factor == the default max edge length -> identical static features.
  # The stored features are already normalized by max length, so recover
  # the raw max length by rebuilding with factor=1.
  raw = gc.GraphCast(
      TINY_GC_TASK, statics,
      gc.GraphCastConfig(latent_size=32, gnn_msg_steps=3,
                         mesh2grid_edge_normalization_factor=1.0),
      rngs=nnx.Rngs(0))
  raw_max = float(jnp.abs(raw.m2g_edge_feats[...][:, 0]).max())
  same = gc.GraphCast(
      TINY_GC_TASK, statics,
      gc.GraphCastConfig(latent_size=32, gnn_msg_steps=3,
                         mesh2grid_edge_normalization_factor=raw_max),
      rngs=nnx.Rngs(0))
  np.testing.assert_allclose(np.asarray(same.m2g_edge_feats[...]),
                             np.asarray(model.m2g_edge_feats[...]),
                             rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize('remat_group', [1, 2])
def test_remat_equivalence(setup, remat_group):
  """GraphCastConfig.remat (encoder/decoder whole-GNN remat + per-MP-step
  remat in the processor) is a pure memory trade: loss and every gradient
  leaf must match the unrematted model bitwise-ish (same op order in the
  primal; AD recompute is the only difference). remat_group=2 over 3 MP
  steps exercises the nested (hierarchical) checkpoints including the
  ragged trailing group."""
  statics, model = setup
  inputs, targets, forcings = _data(statics, TINY_GC_TASK)
  rem = gc.GraphCast(
      TINY_GC_TASK, statics,
      gc.GraphCastConfig(latent_size=32, gnn_msg_steps=3, remat=True,
                         remat_group=remat_group),
      rngs=nnx.Rngs(0))

  def loss_fn(m):
    loss, _ = m.loss(inputs, targets, forcings)
    return loss.mean()

  loss0, grads0 = nnx.value_and_grad(loss_fn)(model)
  loss1, grads1 = nnx.value_and_grad(loss_fn)(rem)
  np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
  l0 = jax.tree_util.tree_leaves(grads0)
  l1 = jax.tree_util.tree_leaves(grads1)
  assert len(l0) == len(l1)
  for a, b in zip(l0, l1):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=1e-6)


def test_build_graphcast_remat_group_implies_remat():
  """An explicit remat_group override must not be a silent no-op on specs
  whose preset leaves remat off (e.g. `train.py --preset 1deg
  --remat_group 4`): grouping requires remat, so it implies it."""
  from gencast_tpu import configs
  assert not configs.TINY.remat_gnns
  model, _ = configs.build_graphcast(configs.TINY, rngs=nnx.Rngs(0),
                                     remat_group=2)
  assert model.mesh_gnn.remat_steps
  assert model.mesh_gnn.remat_group == 2
  # An EXPLICIT remat=False is respected over the implication.
  model2, _ = configs.build_graphcast(configs.TINY, rngs=nnx.Rngs(0),
                                      remat_group=2, remat=False)
  assert not model2.mesh_gnn.remat_steps


def test_autoregressive_loss_gradients(setup):
  statics, model = setup
  stats = L.Stats.unit(set(TINY_GC_TASK.input_variables)
                       | set(TINY_GC_TASK.target_variables),
                       TINY_GC_TASK.pressure_levels)
  wrapped = wrappers.InputsAndResiduals(model, stats)
  inputs, targets, forcings = _data(statics, TINY_GC_TASK, k_steps=3)

  def loss_fn(m):
    loss, diags = R.autoregressive_loss(m, inputs, targets, forcings)
    return loss.mean(), diags

  (loss, diags), grads = nnx.value_and_grad(loss_fn, has_aux=True)(wrapped)
  assert np.isfinite(float(loss))
  assert all(bool(jnp.isfinite(g).all())
             for g in jax.tree_util.tree_leaves(grads))
  assert '2m_temperature' in diags
  # Multi-step loss differs from single-step (window advance matters).
  single, _ = wrapped.loss_and_predictions(inputs, targets[0], forcings[0])


def test_predict_rollout(setup):
  statics, model = setup
  stats = L.Stats.unit(set(TINY_GC_TASK.input_variables)
                       | set(TINY_GC_TASK.target_variables),
                       TINY_GC_TASK.pressure_levels)
  wrapped = wrappers.InputsAndResiduals(model, stats)
  inputs, targets, forcings = _data(statics, TINY_GC_TASK, k_steps=4)
  preds = R.predict_rollout(wrapped, inputs, forcings)
  assert preds.shape == targets.shape
  assert bool(jnp.isfinite(preds).all())
