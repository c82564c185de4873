"""Golden test: spatial features match the reference implementation's math.

Golden values generated from the reference's get_graph_spatial_features
(common/model_utils.py:24-142) on the splits=2 mesh.
"""

import numpy as np

from gencast_tpu.graph import features


def test_matches_reference_goldens():
  g = np.load("tests/goldens/spatial_features_splits2.npz")
  lat, lon = g["lat"], g["lon"]
  nf = features.node_features(lat, lon)
  ef = features.edge_features(lat, lon, g["senders"],
                              lat, lon, g["receivers"]).features
  np.testing.assert_allclose(nf, g["node_feats"], atol=1e-6)
  np.testing.assert_allclose(ef, g["edge_feats"], atol=1e-6)
