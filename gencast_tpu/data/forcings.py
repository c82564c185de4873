"""Derived forcing fields: year/day progress and TISR.

Replaces the reference's data_utils derived-variable machinery
(common/data_utils.py:51-209) with plain-array builders keyed on raw
seconds-since-epoch timestamps, so forcings for every lead time of a
rollout can be precomputed in one shot.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from gencast_tpu.ops import solar

SEC_PER_DAY = 86400
AVG_DAY_PER_YEAR = 365.24219
AVG_SEC_PER_YEAR = SEC_PER_DAY * AVG_DAY_PER_YEAR


def year_progress(seconds_since_epoch: np.ndarray) -> np.ndarray:
  """Year phase in [0, 1) per timestamp (tropical-year approximation)."""
  years = (np.asarray(seconds_since_epoch, np.float64) / SEC_PER_DAY
           / np.float64(AVG_DAY_PER_YEAR))
  return np.mod(years, 1.0).astype(np.float32)


def day_progress(seconds_since_epoch: np.ndarray,
                 lon_deg: np.ndarray) -> np.ndarray:
  """Local solar-day phase in [0, 1): [T, lon]."""
  greenwich = (np.mod(np.asarray(seconds_since_epoch, np.float64),
                      SEC_PER_DAY) / SEC_PER_DAY)
  offsets = np.deg2rad(np.asarray(lon_deg, np.float64)) / (2 * np.pi)
  return np.mod(greenwich[..., None] + offsets, 1.0).astype(np.float32)


def generated_forcings(seconds_since_epoch: np.ndarray,
                       lat_deg: np.ndarray,
                       lon_deg: np.ndarray) -> Dict[str, np.ndarray]:
  """The four GENERATED_FORCING_VARS as [T, lat, lon] fields."""
  t = np.asarray(seconds_since_epoch)
  nlat, nlon = len(lat_deg), len(lon_deg)
  yp = year_progress(t)  # [T]
  dp = day_progress(t, lon_deg)  # [T, lon]

  def tile_year(x):
    return np.broadcast_to(x[:, None, None], (len(t), nlat, nlon)).copy()

  def tile_day(x):
    return np.broadcast_to(x[:, None, :], (len(t), nlat, nlon)).copy()

  phase_y = yp * (2 * np.pi)
  phase_d = dp * (2 * np.pi)
  return {
      'year_progress_sin': tile_year(np.sin(phase_y)),
      'year_progress_cos': tile_year(np.cos(phase_y)),
      'day_progress_sin': tile_day(np.sin(phase_d)),
      'day_progress_cos': tile_day(np.cos(phase_d)),
  }


def all_forcings(seconds_since_epoch: np.ndarray,
                 lat_deg: np.ndarray, lon_deg: np.ndarray,
                 variables: Sequence[str],
                 tisr_integration_period_s: int = 3600
                 ) -> Dict[str, np.ndarray]:
  """Builds the requested forcing variables, each [T, lat, lon].

  Supports GENERATED_FORCING_VARS and toa_incident_solar_radiation.
  """
  out = {}
  generated = None
  for name in variables:
    if name == 'toa_incident_solar_radiation':
      out[name] = np.asarray(solar.tisr_for_grid(
          seconds_since_epoch, lat_deg, lon_deg,
          integration_period_s=tisr_integration_period_s))
    else:
      if generated is None:
        generated = generated_forcings(seconds_since_epoch, lat_deg, lon_deg)
      if name not in generated:
        raise ValueError(f'unknown forcing variable {name}')
      out[name] = generated[name]
  return out
