"""TOA incident solar radiation (TISR), ERA5-compatible, pure JAX.

Computes the top-of-atmosphere incident solar radiation integrated over a
trailing period (1h approximates ERA5's `tisr`), from orbital-mechanics
formulas chosen to match ERA5 (the ECCC GEM radiation code lineage — same
empirical constants as the reference graphcast/solar_radiation.py:197-440).
Everything is jittable; timestamps enter as raw seconds-since-Unix-epoch
arrays, so TISR for all lead times of a rollout can be precomputed on
device.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SECONDS_PER_DAY = 60 * 60 * 24
# Unix epoch (1970-01-01T00) in days relative to J2000 (2000-01-01T12 TT).
_UNIX_TO_J2000_DAYS = -10957.5
_JULIAN_YEAR_DAYS = 365.25

# Reference TSI in W/m^2 when no table is supplied.
REFERENCE_TSI = 1361.0


def era5_tsi_table() -> Tuple[np.ndarray, np.ndarray]:
  """(years, tsi): yearly-average Total Solar Irradiance used by ERA5 (IFS
  cycle 41r2, scaled by 0.9965), years as fractional years since year 0.

  Data table from the ECMWF IFS configuration (reference
  graphcast/solar_radiation.py:83-115); an 11/13-year solar cycle sequence.
  """
  years = np.arange(1951.5, 2035.5, 1.0)
  cycle = [1365.6121, 1365.7399, 1366.1021, 1366.3851, 1366.6836,
           1366.6022, 1366.6807, 1366.2300, 1366.0480, 1365.8545,
           1365.8107, 1365.7240, 1365.6918]
  tsi = 0.9965 * np.array(
      [1365.7765, 1365.7676, 1365.6284, 1365.6564, 1365.7773,
       1366.3109, 1366.6681, 1366.6328, 1366.3828, 1366.2767,
       1365.9199, 1365.7484, 1365.6963, 1365.6976, 1365.7341,
       1365.9178, 1366.1143, 1366.1644, 1366.2476, 1366.2426,
       1365.9580, 1366.0525, 1365.7991, 1365.7271, 1365.5345,
       1365.6453, 1365.8331, 1366.2747, 1366.6348, 1366.6482,
       1366.6951, 1366.2859, 1366.1992, 1365.8103, 1365.6416,
       1365.6379, 1365.7899, 1366.0826, 1366.6479, 1366.5533,
       1366.4457, 1366.3021, 1366.0286, 1365.7971, 1365.6996]
      + cycle * 3)
  return years, tsi


def seconds_to_fractional_year(seconds_since_epoch: np.ndarray) -> np.ndarray:
  """Approximate fractional calendar year (e.g. 2020.5) for TSI lookup."""
  days = np.asarray(seconds_since_epoch, dtype=np.float64) / _SECONDS_PER_DAY
  return 1970.0 + days / 365.2425


def tsi_for_times(seconds_since_epoch, table=None):
  """Interpolated TSI values (W/m^2) per timestamp (constant extrapolation
  at the table edges)."""
  if table is None:
    table = era5_tsi_table()
  years_tab, tsi_tab = table
  years = seconds_to_fractional_year(np.asarray(seconds_since_epoch))
  return jnp.interp(jnp.asarray(years), jnp.asarray(years_tab),
                    jnp.asarray(tsi_tab))


def _orbital_parameters(days_int, day_frac):
  """Declination, equation of time, Earth-Sun distance.

  Empirical polynomials matching the ERA5/IFS radiation scheme. The J2000
  timestamp arrives split into whole days + fractional day so the
  rotational phase (which drives the hour angle) keeps full precision in
  f32 — a raw f32 day count ~9500 would quantize the phase to ~80 s.
  """
  theta = (days_int + day_frac) / _JULIAN_YEAR_DAYS
  rotational_phase = day_frac % 1.0

  rel = 1.7535 + 6.283076 * theta
  rem = 6.240041 + 6.283020 * theta
  rlls = 4.8951 + 6.283076 * theta

  # Ecliptic longitude of the Sun.
  rllls = (4.8952 + 6.283320 * theta - 0.0075 * jnp.sin(rel)
           - 0.0326 * jnp.cos(rel) - 0.0003 * jnp.sin(2.0 * rel)
           + 0.0002 * jnp.cos(2.0 * rel))

  # Axial tilt (23.4393 degrees).
  repsm = 0.409093
  sin_declination = jnp.sin(repsm) * jnp.sin(rllls)
  cos_declination = jnp.sqrt(1.0 - sin_declination ** 2)

  eq_of_time_seconds = (591.8 * jnp.sin(2.0 * rlls) - 459.4 * jnp.sin(rem)
                        + 39.5 * jnp.sin(rem) * jnp.cos(2.0 * rlls)
                        - 12.7 * jnp.sin(4.0 * rlls)
                        - 4.8 * jnp.sin(2.0 * rem))

  solar_distance_au = (1.0001 - 0.0163 * jnp.sin(rel)
                       + 0.0037 * jnp.cos(rel))
  return (rotational_phase, sin_declination, cos_declination,
          eq_of_time_seconds, solar_distance_au)


def radiation_flux(days_int, day_frac, sin_lat, cos_lat, lon_rad, tsi):
  """Instantaneous TOA flux in W/m^2; inputs broadcast together."""
  (rot, sin_dec, cos_dec, eqt, dist) = _orbital_parameters(days_int,
                                                           day_frac)
  solar_time = rot + eqt / _SECONDS_PER_DAY
  hour_angle = 2.0 * jnp.pi * solar_time + lon_rad
  sin_altitude = (cos_lat * cos_dec * jnp.cos(hour_angle)
                  + sin_lat * sin_dec)
  return tsi * (1.0 / dist) ** 2 * jnp.maximum(sin_altitude, 0.0)


@functools.partial(jax.jit, static_argnames=('integration_period_s',
                                             'num_bins'))
def integrated_radiation(days_int, day_frac, sin_lat, cos_lat, lon_rad, tsi,
                         integration_period_s: int = 3600,
                         num_bins: int = 360):
  """TOA radiation integrated over the trailing period (J/m^2), trapezoid
  rule over num_bins; timestamps are period END times (ERA5 convention)."""
  offsets = jnp.linspace(-integration_period_s / _SECONDS_PER_DAY, 0.0,
                         num_bins + 1)
  fluxes = radiation_flux(
      jnp.expand_dims(days_int, -1),
      jnp.expand_dims(day_frac, -1) + offsets,
      jnp.expand_dims(sin_lat, -1), jnp.expand_dims(cos_lat, -1),
      jnp.expand_dims(lon_rad, -1), jnp.expand_dims(tsi, -1))
  dx = integration_period_s / num_bins
  return jax.scipy.integrate.trapezoid(fluxes, dx=dx)


def tisr_for_grid(seconds_since_epoch: np.ndarray,
                  lat_deg: np.ndarray, lon_deg: np.ndarray,
                  integration_period_s: int = 3600,
                  num_bins: int = 360,
                  tsi: Optional[jnp.ndarray] = None) -> jnp.ndarray:
  """TISR fields [T, lat, lon] in J/m^2 for an array of timestamps.

  Timestamps are integration-period end times in seconds since the Unix
  epoch (ERA5 `tisr` semantics).
  """
  secs = np.asarray(seconds_since_epoch, dtype=np.float64)
  # Split into whole days + fractional day on the host in f64 (exact), so
  # f32 device math keeps sub-second phase precision.
  days = secs / _SECONDS_PER_DAY + _UNIX_TO_J2000_DAYS
  days_int = np.floor(days)
  day_frac = days - days_int
  if tsi is None:
    tsi = tsi_for_times(secs)
  lat = np.deg2rad(np.asarray(lat_deg, np.float64))
  lon = np.deg2rad(np.asarray(lon_deg, np.float64))
  sin_lat = jnp.asarray(np.sin(lat), jnp.float32)[None, :, None]
  cos_lat = jnp.asarray(np.cos(lat), jnp.float32)[None, :, None]
  lon_b = jnp.asarray(lon, jnp.float32)[None, None, :]
  out = integrated_radiation(
      jnp.asarray(days_int, jnp.float32)[:, None, None],
      jnp.asarray(day_frac, jnp.float32)[:, None, None],
      sin_lat, cos_lat, lon_b,
      jnp.asarray(tsi, jnp.float32)[:, None, None],
      integration_period_s=integration_period_s, num_bins=num_bins)
  return out.astype(jnp.float32)
