"""Tests for the host-side graph compiler."""

import numpy as np
import pytest

from gencast_tpu.graph import compiler, connectivity, features, icosahedron


def _small_grid():
  # 2.5-degree-style grid with poles, downsampled for speed: 10 deg.
  lat = np.arange(-90.0, 90.0 + 1e-6, 10.0, dtype=np.float32)
  lon = np.arange(0.0, 360.0, 10.0, dtype=np.float32)
  return lat, lon


def test_rcm_reduces_bandwidth():
  mesh = icosahedron.finest_mesh(3)
  s, r = icosahedron.faces_to_edges(mesh.faces)
  bw_orig = np.abs(s - r).max()
  permuted, _ = compiler.rcm_permute(mesh)
  s2, r2 = icosahedron.faces_to_edges(permuted.faces)
  bw_rcm = np.abs(s2 - r2).max()
  assert bw_rcm < bw_orig
  # Permutation preserves the vertex set.
  np.testing.assert_allclose(
      np.sort(np.linalg.norm(permuted.vertices, axis=-1)),
      np.ones(mesh.num_vertices), atol=1e-6)


def test_containing_triangle_exact():
  mesh = icosahedron.finest_mesh(2)
  # Face centroids must be contained in their own face.
  v = mesh.vertices[mesh.faces]
  centroids = v.mean(axis=1)
  centroids /= np.linalg.norm(centroids, axis=-1, keepdims=True)
  found = connectivity.containing_triangle(centroids, mesh)
  np.testing.assert_array_equal(found, np.arange(mesh.num_faces))


def test_receiver_local_rotation_zeroes_receiver():
  lat = np.array([37.0, -55.0, 0.0, 89.0])
  lon = np.array([10.0, 200.0, 350.0, 90.0])
  phi, theta = features.lat_lon_to_spherical(lat, lon)
  pos = features.spherical_to_xyz(phi, theta)
  rot = features.receiver_local_rotations(phi, theta)
  local = np.einsum('nij,nj->ni', rot, pos)
  # Receiver maps to (1, 0, 0): zero lat (z=0) and zero lon (y=0).
  np.testing.assert_allclose(local, np.tile([1.0, 0, 0], (4, 1)), atol=1e-12)


@pytest.fixture(scope="module")
def statics():
  lat, lon = _small_grid()
  return compiler.build_graph_statics(
      mesh_splits=2, grid_lat=lat, grid_lon=lon, attention_k_hop=4)


def test_statics_shapes(statics):
  g = statics
  m = g.num_mesh_nodes
  assert m == 162
  assert g.num_grid_nodes == 19 * 36
  assert g.mesh_node_features.shape == (m, 3)
  assert g.grid_node_features.shape == (g.num_grid_nodes, 3)
  # mesh2grid: exactly 3 edges per grid node.
  assert g.mesh2grid.num_edges == 3 * g.num_grid_nodes
  # grid2mesh: every mesh node receives at least one edge.
  assert np.unique(g.grid2mesh.receivers).shape[0] == m
  # all features normalized into [-1, 1].
  for es in (g.grid2mesh, g.mesh_edges, g.mesh2grid):
    assert np.abs(es.features).max() <= 1.0 + 1e-6
    assert (np.diff(es.receivers) >= 0).all()  # sorted by receiver


def test_banded_mask(statics):
  mask = statics.attention_mask
  assert mask is not None
  nb, bs = mask.num_blocks, mask.block_size
  assert nb * bs == statics.num_mesh_nodes + mask.num_padding_nodes
  # Diagonal blocks include self-attention for real nodes.
  diag = mask.blocks[0]
  total_real = 0
  for b in range(nb):
    for i in range(bs):
      node = b * bs + i
      if node < statics.num_mesh_nodes:
        assert diag[b, i, i]
        total_real += 1
  assert total_real == statics.num_mesh_nodes
  # Padding rows are fully masked.
  assert not mask.blocks[:, -1, bs - mask.num_padding_nodes:, :].any() \
      if mask.num_padding_nodes else True


def test_mask_matches_dense_khop(statics):
  """Tri-block layout reproduces the dense k-hop reachability matrix."""
  from scipy import sparse
  g = statics
  s, r = g.mesh_edges.senders, g.mesh_edges.receivers
  n = g.num_mesh_nodes
  adj = sparse.csr_matrix((np.ones_like(s, bool), (s, r)), shape=(n, n))
  adj = (adj + sparse.identity(n, dtype=bool, format='csr')).astype(bool)
  dense = adj.toarray()
  reach = np.linalg.matrix_power(dense.astype(np.int64),
                                 g.attention_k_hop) > 0
  mask = g.attention_mask
  bs, nb = mask.block_size, mask.num_blocks
  padded = np.zeros((nb * bs, nb * bs), dtype=bool)
  for b in range(nb):
    padded[b*bs:(b+1)*bs, b*bs:(b+1)*bs] = mask.blocks[0, b]
    if b + 1 < nb:
      padded[b*bs:(b+1)*bs, (b+1)*bs:(b+2)*bs] = mask.blocks[1, b]
      padded[(b+1)*bs:(b+2)*bs, b*bs:(b+1)*bs] = mask.blocks[2, b + 1]
  np.testing.assert_array_equal(padded[:n, :n], reach)


def test_spec_attention_tile_size_reaches_plan():
  """ModelSpec.attention_tile_size drives the built tile plan (and is only
  honored for the 'pallas' backend, which is the only consumer)."""
  import dataclasses

  from gencast_tpu import configs

  spec = dataclasses.replace(configs.TINY, attention_type='pallas',
                             attention_tile_size=32)
  statics = configs.build_statics(spec, cache_dir=None)
  assert statics.attention_tile_plan is not None
  assert statics.attention_tile_plan.tile == 32

  tri = dataclasses.replace(configs.TINY, attention_tile_size=32)
  statics_tri = configs.build_statics(tri, cache_dir=None)
  assert statics_tri.attention_tile_plan is None
