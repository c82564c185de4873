"""Tests for derived forcings and TOA solar radiation."""

import numpy as np
import pytest

from gencast_tpu.data import forcings
from gencast_tpu.ops import solar


def test_year_progress_epoch_boundaries():
  # Exactly at epoch: progress 0; one avg year later: back near 0.
  assert forcings.year_progress(np.array([0.0]))[0] == pytest.approx(0.0)
  one_year = forcings.AVG_SEC_PER_YEAR
  assert forcings.year_progress(np.array([one_year]))[0] == pytest.approx(
      0.0, abs=1e-5)
  assert forcings.year_progress(np.array([one_year / 2]))[0] == pytest.approx(
      0.5, abs=1e-5)


def test_day_progress_longitude_offset():
  lon = np.array([0.0, 90.0, 180.0, 270.0])
  dp = forcings.day_progress(np.array([0.0]), lon)
  np.testing.assert_allclose(dp[0], [0.0, 0.25, 0.5, 0.75], atol=1e-6)
  # Noon UTC at Greenwich.
  dp2 = forcings.day_progress(np.array([43200.0]), lon)
  np.testing.assert_allclose(dp2[0], [0.5, 0.75, 0.0, 0.25], atol=1e-6)


def test_generated_forcings_shapes_and_ranges():
  lat = np.arange(-90.0, 90.1, 30.0)
  lon = np.arange(0.0, 360.0, 30.0)
  t = np.array([0.0, 43200.0, 86400.0])
  f = forcings.generated_forcings(t, lat, lon)
  assert set(f) == {'year_progress_sin', 'year_progress_cos',
                    'day_progress_sin', 'day_progress_cos'}
  for v in f.values():
    assert v.shape == (3, lat.size, lon.size)
    assert np.abs(v).max() <= 1.0 + 1e-6
  # sin^2 + cos^2 == 1.
  np.testing.assert_allclose(
      f['day_progress_sin'] ** 2 + f['day_progress_cos'] ** 2, 1.0,
      atol=1e-5)


def test_tsi_interpolation():
  # Mid-2020 is inside the repeated 13-year cycle: 0.9965 * 1365.7240
  # (the reference's golden expectation, solar_radiation_test.py:174).
  secs = (np.datetime64('2020-07-02T00:00') - np.datetime64('1970-01-01')
          ) / np.timedelta64(1, 's')
  tsi = float(solar.tsi_for_times(np.array([secs]))[0])
  assert tsi == pytest.approx(0.9965 * 1365.7240, abs=0.05)


def test_tisr_physical_sanity():
  lat = np.array([-60.0, 0.0, 60.0])
  lon = np.arange(0.0, 360.0, 90.0)
  # March equinox 2020-03-20 ~ noon UTC.
  secs = (np.datetime64('2020-03-20T12:00') - np.datetime64('1970-01-01')
          ) / np.timedelta64(1, 's')
  tisr = np.asarray(solar.tisr_for_grid(np.array([secs]), lat, lon))
  assert tisr.shape == (1, 3, 4)
  assert (tisr >= 0).all()
  # At equinox noon UTC, the subsolar point is near (0, 0): equator at lon 0
  # has the max; the antipode (lon 180) is in darkness.
  assert tisr[0, 1, 0] == tisr.max()
  assert tisr[0, 1, 2] == 0.0
  # 1h integral at the subsolar point is close to TSI * 3600.
  assert tisr[0, 1, 0] == pytest.approx(1361 * 3600, rel=0.03)


def test_tisr_daily_energy_budget():
  """Integrating hourly TISR over a day at the equator during equinox gives
  approximately TSI/pi * seconds_per_day (average insolation factor)."""
  lat = np.array([0.0])
  lon = np.array([0.0])
  base = (np.datetime64('2020-03-20T00:00') - np.datetime64('1970-01-01')
          ) / np.timedelta64(1, 's')
  secs = base + 3600.0 * np.arange(1, 25)
  tisr = np.asarray(solar.tisr_for_grid(secs, lat, lon))
  total = tisr.sum()
  expected = 1361.0 / np.pi * 86400
  assert total == pytest.approx(expected, rel=0.05)


def test_all_forcings_with_tisr():
  lat = np.arange(-90.0, 90.1, 45.0)
  lon = np.arange(0.0, 360.0, 90.0)
  t = np.array([1.6e9, 1.6e9 + 43200])
  out = forcings.all_forcings(
      t, lat, lon,
      ('year_progress_sin', 'toa_incident_solar_radiation'))
  assert set(out) == {'year_progress_sin', 'toa_incident_solar_radiation'}
  for v in out.values():
    assert v.shape == (2, lat.size, lon.size)
