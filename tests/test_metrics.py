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


@pytest.mark.parametrize("m", [2, 3, 7, 16])
def test_sorted_spread_matches_pairwise(m):
  rng = np.random.default_rng(3)
  truth = jnp.asarray(rng.standard_normal((5, 6, 4)), jnp.float32)
  members = jnp.asarray(rng.standard_normal((m, 5, 6, 4)), jnp.float32)
  w = jnp.asarray(rng.random(5), jnp.float32)
  got = metrics.crps_ensemble(members, truth, w, spread='sorted')
  want = metrics.crps_ensemble(members, truth, w, spread='pairwise')
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-6, atol=2e-6)


def test_chunked_scoring_matches_unchunked():
  rng = np.random.default_rng(4)
  m, nlat, nlon, c = 9, 11, 6, 3
  truth = rng.standard_normal((2, nlat, nlon, c)).astype(np.float32)
  members = rng.standard_normal((m, 2, nlat, nlon, c)).astype(np.float32)
  w = rng.random(nlat).astype(np.float32)
  out = metrics.score_ensemble_chunked(members, truth, w, lat_chunk=4)
  crps = metrics.crps_ensemble(jnp.asarray(members), jnp.asarray(truth),
                               jnp.asarray(w))
  rmse = metrics.ensemble_mean_rmse(jnp.asarray(members),
                                    jnp.asarray(truth), jnp.asarray(w))
  spread = metrics.ensemble_spread(jnp.asarray(members), jnp.asarray(w))
  np.testing.assert_allclose(out['crps'], np.asarray(crps), rtol=1e-5)
  np.testing.assert_allclose(out['rmse'], np.asarray(rmse), rtol=1e-5)
  np.testing.assert_allclose(out['spread'], np.asarray(spread), rtol=1e-5)
  assert out['crps'].shape == (2, c)


@pytest.mark.slow
def test_paper_scale_ensemble_scores_in_bounded_memory():
  """50 members x [2, 181, 360, 86] (the GenCast paper's 1-deg ensemble,
  4.5 GB f32) must score with a bounded per-band device footprint."""
  import jax
  m, k, nlat, nlon, c = 50, 2, 181, 360, 86
  lat_chunk = 16

  # Compile the per-band scorer for the band shape and assert its device
  # footprint (args + temps + output) stays under ~2 GB.
  def band_cost():
    mem = jax.ShapeDtypeStruct((m, k, lat_chunk, nlon, c), jnp.float32)
    tru = jax.ShapeDtypeStruct((k, lat_chunk, nlon, c), jnp.float32)
    w = jax.ShapeDtypeStruct((lat_chunk,), jnp.float32)

    @jax.jit
    def band(mem, tru, w):
      crps = metrics._latw(metrics._crps_pointwise(mem, tru, 'sorted'), w)
      return crps.sum(axis=(-3, -2))

    compiled = band.lower(mem, tru, w).compile()
    an = compiled.memory_analysis()
    total = (an.argument_size_in_bytes + an.temp_size_in_bytes +
             an.output_size_in_bytes)
    return total

  total = band_cost()
  assert total < 2 * 1024**3, f'band footprint {total/1e9:.2f} GB'

  # And actually score a real (smaller-lat, same member count) ensemble
  # end-to-end through the chunked path to prove the loop works at M=50.
  rng = np.random.default_rng(5)
  nlat_small = 24
  truth = rng.standard_normal((k, nlat_small, nlon, c)).astype(np.float32)
  members = (truth[None] +
             rng.standard_normal((m, k, nlat_small, nlon, c))
             .astype(np.float32))
  w = np.ones(nlat_small, np.float32)
  out = metrics.score_ensemble_chunked(members, truth, w,
                                       lat_chunk=lat_chunk)
  assert np.all(np.isfinite(out['crps']))
  # Unit-noise ensemble centred on truth: CRPS approx 0.23-0.24
  # (Gaussian closed form), spread approx 1.
  assert 0.15 < out['crps'].mean() < 0.35
  assert 0.9 < out['spread'].mean() < 1.1


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
