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


def crps_ensemble(members: jnp.ndarray, truth: jnp.ndarray,
                  lat_weights: jnp.ndarray) -> jnp.ndarray:
  """Fair (unbiased) ensemble CRPS per channel.

  members: [M, ..., lat, lon, C]; truth: [..., lat, lon, C].
  CRPS = E|X - y| - 1/2 E|X - X'| with the unbiased M(M-1) estimator for
  the spread term. Returns [..., C] (area-weighted spatial mean).
  """
  m = members.shape[0]
  skill = jnp.abs(members - truth[None]).mean(axis=0)
  if m > 1:
    # sum_{i,j} |x_i - x_j| via sorted representation would be cheaper for
    # large M; pairwise is fine for M <= ~64.
    diffs = jnp.abs(members[:, None] - members[None, :])
    spread = diffs.sum(axis=(0, 1)) / (m * (m - 1))
  else:
    spread = jnp.zeros_like(skill)
  crps = skill - 0.5 * spread
  return _latw(crps, lat_weights).mean(axis=(-3, -2))


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
