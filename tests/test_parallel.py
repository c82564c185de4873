"""Tests for mesh/sharding/ensemble utilities on the virtual device mesh."""

import flax.nnx as nnx
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gencast_tpu.parallel import ensemble, meshes


def test_make_mesh_and_shardings():
  mesh = meshes.make_mesh(2, 2, 2)
  assert mesh.shape == {'ensemble': 2, 'data': 2, 'model': 2}
  with pytest.raises(ValueError):
    meshes.make_mesh(3, 1, 1)  # 3 != 8 devices


def test_shard_model_honors_annotations_and_falls_back():
  mesh = meshes.make_mesh(1, 1, 8)

  class M(nnx.Module):
    def __init__(self, rngs):
      from jax.sharding import PartitionSpec as P
      init = nnx.with_partitioning(nnx.initializers.xavier_uniform(),
                                   P(None, 'model'))
      self.big = nnx.Linear(16, 32, kernel_init=init, rngs=rngs)
      self.small = nnx.Linear(16, 3, kernel_init=init, rngs=rngs)

  m = M(nnx.Rngs(0))
  meshes.shard_model(m, mesh)
  big_shard = m.big.kernel[...].sharding
  small_shard = m.small.kernel[...].sharding
  # 32 divides 8 -> sharded over model; 3 doesn't -> replicated fallback.
  assert 'model' in str(big_shard.spec)
  assert 'model' not in str(small_shard.spec)


def test_member_keys_distinct():
  keys = ensemble.member_keys(jax.random.PRNGKey(0), 8)
  assert keys.shape[0] == 8
  assert np.unique(np.asarray(keys), axis=0).shape[0] == 8


def test_ensemble_statistics():
  mesh = meshes.make_mesh(8, 1, 1)
  rng = np.random.default_rng(0)
  members = jnp.asarray(rng.standard_normal((8, 4, 6)), jnp.float32)
  from jax.sharding import NamedSharding, PartitionSpec as P
  members_sharded = jax.device_put(
      members, NamedSharding(mesh, P('ensemble')))
  mean, std = ensemble.ensemble_statistics(members_sharded, mesh)
  np.testing.assert_allclose(np.asarray(mean),
                             np.asarray(members).mean(axis=0), atol=1e-6)
  np.testing.assert_allclose(np.asarray(std),
                             np.asarray(members).std(axis=0, ddof=1),
                             atol=1e-6)


def test_throughput_meter():
  from gencast_tpu.utils import Throughput
  t = Throughput()
  assert t.tick() is None
  assert t.tick() is not None and t.rate > 0
