"""Executable TISR parity vs the reference's own solar_radiation module.

Runs the reference's `get_toa_incident_solar_radiation`
(/root/reference/graphcast/solar_radiation.py:443-521) via tests/ref_shim
(its xarray use is only the TSI-table DataArray holder) with jax x64
enabled — the reference passes J2000 days as one float, so in f32 its
rotational phase quantizes to ~84 s and would dominate the comparison;
x64 makes it the high-precision oracle. Our `ops/solar.tisr_for_grid`
runs at its production precision (f32 device math on a host-side f64
int/frac day split) and must match to <=1e-4 of the field scale.

Run standalone (the pytest wrapper adds a subprocess case because x64 is
a process-global flag):

  python -m tests.tisr_parity_impl
"""

import os
import sys

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import ref_shim  # noqa: E402

ref_shim.install()

from graphcast import solar_radiation as ref_solar  # noqa: E402

from gencast_tpu.ops import solar as my_solar  # noqa: E402


def test_tisr_parity():
  lat = np.arange(-90.0, 90.0 + 1e-6, 15.0)
  lon = np.arange(0.0, 360.0, 15.0)
  # Span seasons, decades, leap years and odd hours (incl. a pre-table
  # year exercising constant extrapolation on both sides).
  timestamps = [
      '1940-07-01T12:00:00',
      '1995-01-01T00:00:00',
      '2000-02-29T06:00:00',
      '2012-03-20T12:00:00',
      '2020-06-21T18:00:00',
      '2023-12-21T09:00:00',
  ]
  ref_out = np.asarray(ref_solar.get_toa_incident_solar_radiation(
      timestamps, lat, lon))

  # datetime64[s] is resolution-explicit (pandas 2 DatetimeIndex.view can
  # be us- or ns-resolution depending on construction).
  secs = np.array(timestamps, dtype='datetime64[s]').astype(np.int64)
  mine = np.asarray(my_solar.tisr_for_grid(secs, lat, lon))

  assert mine.shape == ref_out.shape == (len(timestamps), lat.size, lon.size)
  scale = np.abs(ref_out).max()
  rel = np.abs(mine - ref_out).max() / scale
  print(f'TISR parity: max rel err {rel:.2e} (scale {scale:.3e} J/m^2)')
  assert rel <= 1e-4, rel


if __name__ == '__main__':
  test_tisr_parity()
  print('TISR parity OK')
