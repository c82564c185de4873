"""Tests for probabilistic verification metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gencast_tpu.ops import metrics


def _flat_weights(nlat):
  return jnp.ones(nlat)


def test_crps_perfect_deterministic_forecast_is_zero():
  truth = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 3))
  members = jnp.stack([truth, truth])
  crps = metrics.crps_ensemble(members, truth, _flat_weights(4))
  np.testing.assert_allclose(np.asarray(crps), 0.0, atol=1e-7)


def test_crps_matches_closed_form_gaussian():
  """For a large Gaussian ensemble and Gaussian truth at the ensemble mean,
  CRPS -> sigma * (1/sqrt(pi))... use the standard result for y = mu:
  CRPS(N(0,1), y=0) = (sqrt(2) - 1) / sqrt(pi)."""
  m = 4000
  members = jax.random.normal(jax.random.PRNGKey(1), (m, 1, 1, 1))
  truth = jnp.zeros((1, 1, 1))
  crps = float(metrics.crps_ensemble(members, truth, _flat_weights(1))[0])
  want = (np.sqrt(2.0) - 1.0) / np.sqrt(np.pi)
  assert crps == pytest.approx(want, rel=0.05)


def test_rmse_and_spread():
  rng = np.random.default_rng(2)
  truth = jnp.asarray(rng.standard_normal((4, 6, 2)))
  members = truth[None] + jnp.asarray(rng.standard_normal((8, 4, 6, 2)))
  rmse = metrics.ensemble_mean_rmse(members, truth, _flat_weights(4))
  spread = metrics.ensemble_spread(members, _flat_weights(4))
  assert rmse.shape == (2,)
  # Unit-noise members: spread ~ 1, rmse of 8-member mean ~ 1/sqrt(8).
  np.testing.assert_allclose(np.asarray(spread), 1.0, atol=0.25)
  np.testing.assert_allclose(np.asarray(rmse), 1 / np.sqrt(8), atol=0.2)


def test_latitude_weighting_applies():
  truth = jnp.zeros((2, 3, 1))
  members = jnp.ones((1, 2, 3, 1))
  w = jnp.asarray([2.0, 0.0])
  rmse = metrics.ensemble_mean_rmse(members, truth, w)
  # error 1 everywhere; weighted mean of squared err = (2+0)/2 = 1.
  np.testing.assert_allclose(np.asarray(rmse), 1.0, atol=1e-6)


def test_per_variable_grouping():
  from gencast_tpu.data import layout as L
  lay = L.build_layout(('2m_temperature', 'temperature'), (500, 850), 1)
  vals = jnp.asarray([1.0, 2.0, 4.0])  # 2m, temp l0, temp l1
  out = metrics.per_variable(vals, lay)
  assert out['2m_temperature'] == pytest.approx(1.0)
  assert out['temperature'] == pytest.approx(3.0)
