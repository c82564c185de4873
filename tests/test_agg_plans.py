"""Scatter-free aggregation plans (Pallas MXU one-hot kernel) vs scatter.

Covers the role of jraph.segment_sum in the reference
(common/typed_graph_net.py:173-182) for skewed static degree
distributions: plan profitability gating, forward/grad parity of
segment_sum_planned and gather_planned against the XLA scatter path, and
end-to-end equivalence of a planned InteractionNetwork / GenCast model.
"""

import dataclasses

import flax.nnx as nnx
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gencast_tpu.nn.gnn import EdgeTopology, InteractionNetwork
from gencast_tpu.ops import segment


def _ref_segment_sum(data, ids, n):
  return jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(ids),
                             num_segments=n)


def _skewed_ids(rng, n, e, sorted_=True):
  # Polar-skew-like distribution: a few segments get most edges.
  weights = 1.0 / (1.0 + np.arange(n))
  ids = rng.choice(np.arange(n), size=e, p=weights / weights.sum())
  return np.sort(ids).astype(np.int32) if sorted_ else ids.astype(np.int32)


def test_plan_profitability_gate():
  rng = np.random.default_rng(0)
  skew = _skewed_ids(rng, 200, 4000)
  assert segment.plan_if_profitable(skew, 200) is not None
  # Uniform-consecutive: dense fast path upstream, no plan.
  uniform = np.repeat(np.arange(100), 4).astype(np.int32)
  assert segment.plan_if_profitable(uniform, 100) is None
  # Low max degree: XLA scatter wins, no plan.
  low = np.sort(rng.choice(np.arange(1000), size=2000)).astype(np.int32)
  assert segment.plan_if_profitable(low, 1000) is None
  assert segment.plan_if_profitable(np.zeros(0, np.int32), 10) is None


@pytest.mark.parametrize('sorted_', [True, False])
def test_segment_sum_planned_matches_scatter(sorted_):
  rng = np.random.default_rng(1)
  n, e, b, c = 300, 2500, 2, 36
  ids = _skewed_ids(rng, n, e, sorted_)
  plan = segment.build_agg_plan(ids, n, tile=64, width=128)
  assert (plan.perm is None) == sorted_
  arrs, meta = plan.device_arrays(), plan.meta
  data = rng.standard_normal((e, b, c)).astype(np.float32)

  out = segment.segment_sum_planned(jnp.asarray(data), arrs, meta)
  ref = _ref_segment_sum(data, ids, n)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=1e-5, atol=1e-5)

  gk = jax.grad(lambda d: (segment.segment_sum_planned(d, arrs, meta)
                           ** 2).sum())(jnp.asarray(data))
  gr = jax.grad(lambda d: (_ref_segment_sum(d, ids, n) ** 2).sum())(
      jnp.asarray(data))
  np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                             rtol=1e-4, atol=1e-4)


def test_segment_sum_planned_options():
  rng = np.random.default_rng(2)
  n, e = 128, 1000
  ids = _skewed_ids(rng, n, e)
  plan = segment.build_agg_plan(ids, n, tile=64, width=128)
  arrs, meta = plan.device_arrays(), plan.meta
  data = rng.standard_normal((e, 1, 16)).astype(jnp.bfloat16)
  out = segment.segment_sum_planned(jnp.asarray(data), arrs, meta,
                                    f32_accumulate=True, normalization=2.0)
  assert out.dtype == jnp.bfloat16
  ref = _ref_segment_sum(np.asarray(data, np.float32), ids, n) / 2.0
  np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                             rtol=2e-2, atol=2e-2)


def test_gather_planned_transpose():
  rng = np.random.default_rng(3)
  n, e, b, c = 200, 1500, 2, 24
  ids = _skewed_ids(rng, n, e, sorted_=False)
  plan = segment.build_agg_plan(ids, n, tile=64, width=128)
  arrs, meta = plan.device_arrays(), plan.meta
  nodes = rng.standard_normal((n, b, c)).astype(np.float32)
  w = rng.standard_normal((e, b, c)).astype(np.float32)

  out = segment.gather_planned(jnp.asarray(nodes), jnp.asarray(ids), arrs,
                               meta)
  np.testing.assert_array_equal(np.asarray(out), nodes[ids])

  gk = jax.grad(lambda nd: (segment.gather_planned(
      nd, jnp.asarray(ids), arrs, meta) * w).sum())(jnp.asarray(nodes))
  gr = jax.grad(lambda nd: (jnp.take(nd, jnp.asarray(ids), axis=0)
                            * w).sum())(jnp.asarray(nodes))
  np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                             rtol=1e-4, atol=1e-4)


def test_interaction_network_with_plans_matches_without():
  """Planned and plain InteractionNetworks share weights -> same fwd+grads."""
  rng = np.random.default_rng(4)
  n_a, n_b, e = 150, 90, 1200
  senders = _skewed_ids(rng, n_a, e, sorted_=False)
  receivers = _skewed_ids(rng, n_b, e)

  topo = EdgeTopology('ab', 'a', 'b', senders, receivers)
  topo_planned = topo.with_agg_plans(n_a, n_b, tile=64, width=128)
  assert (topo_planned.recv_plan is not None
          and topo_planned.sender_plan is not None)

  def make(t):
    return InteractionNetwork(
        topologies=[t], node_sizes={'a': 16, 'b': 16},
        edge_sizes={'ab': 16}, num_nodes={'a': n_a, 'b': n_b},
        mlp_hidden_size=32, mlp_num_hidden_layers=1,
        activation=jax.nn.swish, use_layer_norm=True,
        use_norm_conditioning=False, f32_aggregation=True,
        aggregate_normalization=None, rngs=nnx.Rngs(0))

  net_plain = make(topo)
  net_planned = make(topo_planned)
  # Same rng seed -> identical params (plan buffers are StaticData).
  nodes = {'a': jnp.asarray(rng.standard_normal((n_a, 2, 16)), jnp.float32),
           'b': jnp.asarray(rng.standard_normal((n_b, 2, 16)), jnp.float32)}
  edges = {'ab': jnp.asarray(rng.standard_normal((e, 2, 16)), jnp.float32)}

  def loss(net, nodes, edges):
    out_nodes, out_edges = net(nodes, edges)
    return (sum((v ** 2).sum() for v in out_nodes.values())
            + (out_edges['ab'] ** 2).sum())

  l0 = loss(net_plain, nodes, edges)
  l1 = loss(net_planned, nodes, edges)
  np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)

  g0 = nnx.grad(loss, argnums=0)(net_plain, nodes, edges)
  g1 = nnx.grad(loss, argnums=0)(net_planned, nodes, edges)
  flat0 = jax.tree.leaves(g0)
  flat1 = jax.tree.leaves(g1)
  assert len(flat0) == len(flat1)
  for a, b in zip(flat0, flat1):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_gencast_with_agg_plans_matches_plain():
  """use_agg_plans=True is a pure execution-strategy switch: identical
  loss and gradients on a tiny GenCast."""
  from gencast_tpu.data import registry
  from gencast_tpu.graph import compiler
  from gencast_tpu.models import gencast as gencast_lib
  from gencast_tpu.models.denoiser import DenoiserConfig
  from gencast_tpu.nn.transformer import TransformerConfig

  task = registry.TaskSpec(
      input_variables=('2m_temperature', 'year_progress_sin'),
      target_variables=('2m_temperature',),
      forcing_variables=('year_progress_sin',),
      pressure_levels=(500,), num_input_frames=2)
  lat = np.arange(-90.0, 90.0 + 1e-6, 30.0, dtype=np.float32)
  lon = np.arange(0.0, 360.0, 30.0, dtype=np.float32)
  statics = compiler.build_graph_statics(1, lat, lon, attention_k_hop=2)
  transformer = TransformerConfig(d_model=16, num_layers=1, num_heads=2,
                                  ffw_hidden=32)

  def build(use_plans):
    return gencast_lib.GenCast(
        task, statics, transformer,
        denoiser_config=DenoiserConfig(latent_size=16,
                                       use_agg_plans=use_plans,
                                       agg_plan_min_degree=2),
        sampler_config=gencast_lib.SamplerConfig(num_noise_levels=2),
        rngs=nnx.Rngs(0))

  m0, m1 = build(False), build(True)
  # The tiny graph must actually trigger at least one plan for this test
  # to exercise the kernel path (grid2mesh onto 42 mesh nodes is skewed).
  arch = m1.denoiser.architecture
  planned = [t for t in arch.grid2mesh.topologies + arch.mesh2grid.topologies
             if t.recv_plan is not None or t.sender_plan is not None]
  assert planned, 'tiny graph produced no plans; lower min_max_degree'

  rng = np.random.default_rng(0)
  b, nlat, nlon = 1, lat.shape[0], lon.shape[0]
  inputs = jnp.asarray(rng.standard_normal(
      (b, nlat, nlon, m0.denoiser.input_layout.num_channels)), jnp.float32)
  targets = jnp.asarray(rng.standard_normal(
      (b, nlat, nlon, m0.denoiser.target_layout.num_channels)), jnp.float32)
  forcings = jnp.asarray(rng.standard_normal(
      (b, nlat, nlon, m0.denoiser.forcing_layout.num_channels)), jnp.float32)

  def loss_fn(m):
    loss, _ = m.loss(inputs, targets, forcings, jax.random.PRNGKey(0))
    return loss.mean()

  l0, g0 = nnx.value_and_grad(loss_fn)(m0)
  l1, g1 = nnx.value_and_grad(loss_fn)(m1)
  np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
  p0 = jax.tree.leaves(nnx.state(g0, nnx.Param))
  p1 = jax.tree.leaves(nnx.state(g1, nnx.Param))
  assert len(p0) == len(p1)
  for a, b_ in zip(p0, p1):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               rtol=5e-4, atol=1e-5)


def test_planned_topology_jit_cache_stability():
  """Recreating the same planned topology hits the same jit cache entry."""
  rng = np.random.default_rng(5)
  senders = _skewed_ids(rng, 50, 600, sorted_=False)
  receivers = _skewed_ids(rng, 40, 600)
  t1 = EdgeTopology('x', 'a', 'b', senders, receivers).with_agg_plans(50, 40)
  t2 = EdgeTopology('x', 'a', 'b', senders, receivers).with_agg_plans(50, 40)
  assert t1.recv_plan is not None
  assert t1 == t2 and hash(t1) == hash(t2)
  t3 = EdgeTopology('x', 'a', 'b', senders, receivers)
  assert t1 != t3
