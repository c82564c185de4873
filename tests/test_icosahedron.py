"""Analytic tests of the icosahedral mesh hierarchy.

Mirrors the reference's test strategy (common/icosahedral_mesh_test.py):
counts from the closed-form formulas, unit-norm vertices, outward (CCW)
face orientation, prefix property of the hierarchy, and edge enumeration.
"""

import numpy as np
import pytest

from gencast_tpu.graph import icosahedron


@pytest.mark.parametrize("splits", [0, 1, 2, 3, 4])
def test_counts(splits):
  mesh = icosahedron.finest_mesh(splits)
  assert mesh.num_vertices == 10 * 4**splits + 2
  assert mesh.num_faces == 20 * 4**splits
  # Closed surface: E = 3F/2 undirected, 3F directed.
  senders, receivers = icosahedron.faces_to_edges(mesh.faces)
  assert senders.shape[0] == 3 * mesh.num_faces


@pytest.mark.parametrize("splits", [0, 1, 3])
def test_unit_norm_and_orientation(splits):
  mesh = icosahedron.finest_mesh(splits)
  norms = np.linalg.norm(mesh.vertices, axis=-1)
  np.testing.assert_allclose(norms, 1.0, atol=1e-6)
  # CCW from outside: (v1-v0) x (v2-v0) . centroid > 0
  v = mesh.vertices[mesh.faces]
  normal = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
  centroid = v.mean(axis=1)
  assert (np.einsum('fd,fd->f', normal, centroid) > 0).all()


def test_hierarchy_prefix_property():
  meshes = icosahedron.mesh_hierarchy(3)
  for lo, hi in zip(meshes[:-1], meshes[1:]):
    np.testing.assert_allclose(lo.vertices, hi.vertices[:lo.num_vertices])


def test_edges_bidirectional():
  mesh = icosahedron.finest_mesh(2)
  s, r = icosahedron.faces_to_edges(mesh.faces)
  fwd = set(zip(s.tolist(), r.tolist()))
  assert all((b, a) in fwd for a, b in fwd)


def test_merge_hierarchy():
  meshes = icosahedron.mesh_hierarchy(2)
  merged = icosahedron.merge_hierarchy(meshes)
  assert merged.num_vertices == meshes[-1].num_vertices
  assert merged.num_faces == sum(m.num_faces for m in meshes)


def test_matches_reference_goldens():
  """Vertex positions & faces identical to the reference implementation."""
  golden = np.load("tests/goldens/icosahedron_splits2.npz")
  mesh = icosahedron.finest_mesh(2)
  np.testing.assert_allclose(mesh.vertices, golden["vertices"], atol=1e-7)
  np.testing.assert_array_equal(mesh.faces, golden["faces"])
