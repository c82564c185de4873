"""Tests for the native (C++) containing-triangle kernel."""

import numpy as np
import pytest

from gencast_tpu.graph import connectivity, icosahedron, native


@pytest.fixture(scope='module')
def lib():
  l = native.get_lib()
  if l is None:
    pytest.skip('native toolchain unavailable')
  return l


def test_native_matches_numpy_up_to_boundary_ties(lib):
  mesh = icosahedron.finest_mesh(3)
  lat = np.arange(-88.0, 88.1, 4.0)
  lon = np.arange(1.0, 360.0, 4.0)  # offset to reduce exact-edge hits
  pts = connectivity.grid_lat_lon_to_xyz(lat, lon).reshape(-1, 3)
  a = connectivity.containing_triangle(pts, mesh, use_native=True)
  b = connectivity.containing_triangle(pts, mesh, use_native=False)

  verts = mesh.vertices.astype(np.float64)
  disagree = np.nonzero(a != b)[0]
  # Any disagreement must be a point on a shared edge: both faces contain it.
  for i in disagree:
    for f in (a[i], b[i]):
      v = verts[mesh.faces[f]]
      margin = min(
          np.dot(np.cross(v[0], v[1]), pts[i]),
          np.dot(np.cross(v[1], v[2]), pts[i]),
          np.dot(np.cross(v[2], v[0]), pts[i]))
      assert margin > -1e-9, (i, f, margin)
  # And ties must be rare.
  assert disagree.size < 0.01 * pts.shape[0]


def test_native_centroids_exact(lib):
  mesh = icosahedron.finest_mesh(2)
  v = mesh.vertices[mesh.faces]
  centroids = v.mean(axis=1)
  centroids /= np.linalg.norm(centroids, axis=-1, keepdims=True)
  found = native.containing_triangle(centroids, mesh.vertices, mesh.faces)
  assert found is not None
  np.testing.assert_array_equal(found, np.arange(mesh.num_faces))
