"""Probabilistic forecast verification metrics.

Ensemble scoring for GenCast-style forecasts: CRPS (the paper's headline
metric), ensemble-mean RMSE, and spread/skill — all latitude-area-weighted,
computed on packed [members, ..., lat, lon, channels] tensors on device.
The reference repo has no scoring code (its weatherbench eval lives
elsewhere); these follow the standard WeatherBench2 definitions.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from gencast_tpu.data import layout as layout_lib


def _latw(err: jnp.ndarray, lat_weights: jnp.ndarray) -> jnp.ndarray:
  """Apply [lat] weights to a [..., lat, lon, C] tensor."""
  return err * lat_weights.astype(err.dtype)[..., :, None, None]


def _crps_pointwise(members: jnp.ndarray, truth: jnp.ndarray,
                    spread: str) -> jnp.ndarray:
  """CRPS per grid point: E|X - y| - 1/2 E|X - X'|, unbiased M(M-1) spread.

  spread='sorted' uses the order-statistics identity
    sum_{i,j} |x_i - x_j| = 2 * sum_k (2k - M + 1) x_(k)
  (x_(k) ascending, k = 0..M-1): O(M log M) time, O(M) memory per point —
  the pairwise [M, M, ...] form is ~56 GB at the paper's 50-member 1-deg
  scale. 'pairwise' is kept as the small-M cross-check oracle.
  """
  m = members.shape[0]
  skill = jnp.abs(members - truth[None]).mean(axis=0)
  if m == 1:
    return skill
  if spread == 'pairwise':
    diffs = jnp.abs(members[:, None] - members[None, :])
    sp = diffs.sum(axis=(0, 1)) / (m * (m - 1))
  elif spread == 'sorted':
    srt = jnp.sort(members, axis=0)
    coef = (2.0 * jnp.arange(m, dtype=srt.dtype) - m + 1)
    sp = 2.0 * jnp.tensordot(coef, srt, axes=(0, 0)) / (m * (m - 1))
  else:
    raise ValueError(f'unknown spread estimator: {spread!r}')
  return skill - 0.5 * sp


def crps_ensemble(members: jnp.ndarray, truth: jnp.ndarray,
                  lat_weights: jnp.ndarray,
                  spread: str = 'sorted') -> jnp.ndarray:
  """Fair (unbiased) ensemble CRPS per channel.

  members: [M, ..., lat, lon, C]; truth: [..., lat, lon, C].
  Returns [..., C] (area-weighted spatial mean). For ensembles too large
  to score in one device allocation use score_ensemble_chunked.
  """
  crps = _crps_pointwise(members, truth, spread)
  return _latw(crps, lat_weights).mean(axis=(-3, -2))


def score_ensemble_chunked(members, truth, lat_weights,
                           lat_chunk: int = 16) -> Dict[str, np.ndarray]:
  """CRPS + ensemble-mean RMSE + spread, streamed over latitude bands.

  members: [M, ..., lat, lon, C] (host numpy or device); truth:
  [..., lat, lon, C]. Each band is scored on device independently
  (CRPS/RMSE/spread are pointwise before the spatial mean), so device
  peak is O(M * lat_chunk * lon * C) regardless of ensemble size: the
  paper-scale [50, 2, 181, 360, 86] f32 ensemble (4.5 GB) scores in
  ~0.4 GB bands. Results are bit-comparable to the unchunked fns up to
  f32 summation order. Returns {'crps', 'rmse', 'spread'}: [..., C].
  """
  import jax

  members = np.asarray(members)
  truth = np.asarray(truth)
  lat_weights = np.asarray(lat_weights)
  nlat, nlon = truth.shape[-3], truth.shape[-2]

  @jax.jit
  def band(mem, tru, w):
    crps = _latw(_crps_pointwise(mem, tru, 'sorted'), w).sum(axis=(-3, -2))
    err = (mem.mean(axis=0) - tru) ** 2
    rmse_sq = _latw(err, w).sum(axis=(-3, -2))
    var = (mem.var(axis=0, ddof=1) if mem.shape[0] > 1
           else jnp.zeros_like(mem[0]))
    spread_sq = _latw(var, w).sum(axis=(-3, -2))
    return crps, rmse_sq, spread_sq

  sums = None
  for lo in range(0, nlat, lat_chunk):
    hi = min(lo + lat_chunk, nlat)
    sl = (Ellipsis, slice(lo, hi), slice(None), slice(None))
    out = band(jnp.asarray(members[sl]), jnp.asarray(truth[sl]),
               jnp.asarray(lat_weights[lo:hi]))
    out = [np.asarray(o, np.float64) for o in out]
    sums = out if sums is None else [a + b for a, b in zip(sums, out)]
  area = nlat * nlon
  crps, rmse_sq, spread_sq = sums
  return {'crps': crps / area,
          'rmse': np.sqrt(rmse_sq / area),
          'spread': np.sqrt(spread_sq / area)}


def ensemble_mean_rmse(members: jnp.ndarray, truth: jnp.ndarray,
                       lat_weights: jnp.ndarray) -> jnp.ndarray:
  """Area-weighted RMSE of the ensemble mean, per channel: [..., C]."""
  err = (members.mean(axis=0) - truth) ** 2
  return jnp.sqrt(_latw(err, lat_weights).mean(axis=(-3, -2)))


def ensemble_spread(members: jnp.ndarray,
                    lat_weights: jnp.ndarray) -> jnp.ndarray:
  """Area-weighted ensemble standard deviation, per channel: [..., C]."""
  var = members.var(axis=0, ddof=1) if members.shape[0] > 1 else \
      jnp.zeros_like(members[0])
  return jnp.sqrt(_latw(var, lat_weights).mean(axis=(-3, -2)))


def per_variable(metric_per_channel: jnp.ndarray,
                 layout: layout_lib.ChannelLayout) -> Dict[str, np.ndarray]:
  """Averages a [..., C] per-channel metric into per-variable scalars."""
  x = np.asarray(metric_per_channel)
  out = {}
  for name in layout.var_names:
    out[name] = x[..., layout.var_channels(name)].mean(axis=-1)
  return out
