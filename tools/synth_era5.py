"""Synthesizes an ERA5-format monthly NetCDF corpus for end-to-end tests.

Writes the exact file layout `data/era5_netcdf.py` parses (the reference
CDS download layout, training/era5_dataset.py:43-345):

  era5_pressure_levels_YYYYMM_<res>deg.nc   (t/z/u/v/w/q on levels)
  era5_single_levels_YYYYMM_<res>deg.nc     (t2m/msl/u10/v10/sst/tp)
  era5_static_<res>deg.nc                   (lsm, surface z)

Fields are smooth, seasonally/diurnally structured and temporally
autocorrelated (an AR(1) walk over low-order spherical harmonics on top
of a deterministic climatology), so a model trained on them has real
signal to fit — this closes the "real-data path never ran end-to-end"
loop with a corpus the h5py reader treats exactly like a CDS download:
descending latitude (exercises the flip), int16-packed temperature
(exercises scale/offset decode), NaN-filled SST over land, cumulative
precipitation (exercises the 12h differencing).

Usage:
  python -m tools.synth_era5 --out /tmp/era5_synth --resolution 10.0 \
      --months 202001 202002 --steps_per_month 40
"""

from __future__ import annotations

import argparse
import os
from typing import Sequence

import numpy as np

from gencast_tpu.data import netcdf_writer
from gencast_tpu.data.registry import PRESSURE_LEVELS_WEATHERBENCH_13


def _month_start_seconds(yyyymm: str) -> float:
  base = np.datetime64(f'{yyyymm[:4]}-{yyyymm[4:]}-01T00:00:00')
  return float((base - np.datetime64('1970-01-01T00:00:00'))
               / np.timedelta64(1, 's'))


class _FieldGen:
  """Smooth random fields with AR(1) time correlation.

  Each variable gets a fixed random set of low-order (lat, lon) harmonic
  modes; their amplitudes follow an AR(1) walk across time steps, giving
  12h-step autocorrelation ~rho so that persistence + learned dynamics
  both beat climatology (what a weather model needs to have signal).
  """

  def __init__(self, lat_deg, lon_deg, seed, num_modes=8, rho=0.95):
    rng = np.random.default_rng(seed)
    lat = np.deg2rad(lat_deg)[:, None]
    lon = np.deg2rad(lon_deg)[None, :]
    self._modes = []
    for _ in range(num_modes):
      kl = rng.integers(1, 4)
      km = rng.integers(1, 5)
      phase = rng.uniform(0, 2 * np.pi)
      self._modes.append(np.cos(kl * lat) * np.cos(km * lon + phase))
    self._modes = np.stack(self._modes)          # [M, lat, lon]
    self._rng = rng
    self._rho = rho
    self._amps = {}

  def step(self, name: str) -> np.ndarray:
    """Next time step's anomaly field for variable `name` (unit scale)."""
    a = self._amps.get(name)
    innov = self._rng.standard_normal(self._modes.shape[0])
    a = (innov if a is None
         else self._rho * a + np.sqrt(1 - self._rho ** 2) * innov)
    self._amps[name] = a
    return np.tensordot(a, self._modes, axes=1) / np.sqrt(len(a))


def synthesize(out_dir: str,
               resolution_deg: float = 10.0,
               months: Sequence[str] = ('202001',),
               steps_per_month: int = 40,
               levels: Sequence[int] = PRESSURE_LEVELS_WEATHERBENCH_13,
               seed: int = 0,
               step_seconds: float = 12 * 3600) -> None:
  os.makedirs(out_dir, exist_ok=True)
  res = f'{resolution_deg:.2f}deg'
  lat = np.arange(90.0, -90.0 - 1e-6, -resolution_deg)  # ERA5: descending
  lon = np.arange(0.0, 360.0, resolution_deg)
  levels = np.asarray(levels, np.int32)
  nlat, nlon, nlev = lat.size, lon.size, levels.size

  lat2 = np.deg2rad(lat)[:, None]
  coslat = np.cos(lat2)
  gen = _FieldGen(lat, lon, seed)

  # Static fields (shared by all months).
  lsm = (gen.step('lsm_shape') + 0.3 * np.sin(2 * lat2) > 0.1
         ).astype(np.float32)
  zs = np.maximum(gen.step('orography'), 0.0) * 2.0e4 * lsm
  netcdf_writer.write_dataset(
      os.path.join(out_dir, f'era5_static_{res}.nc'),
      {'latitude': lat, 'longitude': lon},
      {'lsm': (('latitude', 'longitude'), lsm.astype(np.float32)),
       'z': (('latitude', 'longitude'), zs.astype(np.float32))},
      global_attrs={'source': 'tools/synth_era5.py', 'seed': seed})

  # Standard-atmosphere-ish vertical structure.
  lev_frac = levels.astype(np.float64) / 1000.0          # 0.05 .. 1.0
  t_base = 210.0 + 80.0 * lev_frac                       # K
  z_base = 7000.0 * 9.80665 * np.log(1.0 / lev_frac + 1e-9)  # m^2/s^2
  q_base = 0.012 * lev_frac ** 3

  for month in months:
    t0 = _month_start_seconds(month)
    times = t0 + np.arange(steps_per_month) * step_seconds
    year_frac = 2 * np.pi * (times / (365.2425 * 86400.0) % 1.0)
    day_frac = 2 * np.pi * (times / 86400.0 % 1.0)

    def surf(name, base, amp, diurnal=0.0):
      out = np.empty((times.size, nlat, nlon), np.float32)
      for i in range(times.size):
        seasonal = amp * 0.3 * np.sin(year_frac[i]) * np.sin(lat2)
        diur = diurnal * np.cos(
            day_frac[i] + np.deg2rad(lon)[None, :]) * coslat
        out[i] = base + 20.0 * coslat * (amp / 30.0) + seasonal + diur \
            + amp * 0.25 * gen.step(name)
      return out

    t2m = surf('t2m', 278.0, 30.0, diurnal=4.0)
    msl = surf('msl', 101325.0, 1500.0)
    u10 = surf('u10', 0.0, 8.0)
    v10 = surf('v10', 0.0, 6.0)
    sst = surf('sst', 288.0, 10.0)
    sst[:, lsm > 0.5] = np.nan                           # NaN over land
    # Cumulative precip within the month; the reader differences it.
    rate = np.maximum(surf('tp', 0.0, 1.0), 0.0) * 2e-3
    tp = np.cumsum(rate, axis=0).astype(np.float32)

    single_path = os.path.join(out_dir,
                               f'era5_single_levels_{month}_{res}.nc')
    sst_fill = np.float32(-32767.0)
    sst_packed = np.where(np.isnan(sst), sst_fill, sst).astype(np.float32)
    netcdf_writer.write_dataset(
        single_path,
        {'valid_time': times, 'latitude': lat, 'longitude': lon},
        {'t2m': (('valid_time', 'latitude', 'longitude'), t2m),
         'msl': (('valid_time', 'latitude', 'longitude'), msl),
         'u10': (('valid_time', 'latitude', 'longitude'), u10),
         'v10': (('valid_time', 'latitude', 'longitude'), v10),
         'sst': (('valid_time', 'latitude', 'longitude'), sst_packed),
         'tp': (('valid_time', 'latitude', 'longitude'), tp)},
        dim_attrs={'valid_time':
                   {'units': b'seconds since 1970-01-01'}})
    # Mark the SST fill value (decoded back to NaN by the reader).
    import h5py
    with h5py.File(single_path, 'a') as f:
      f['sst'].attrs['_FillValue'] = sst_fill

    atmos = {}
    for name, base, amp in (('t', t_base, 12.0), ('z', z_base, 800.0),
                            ('u', 10.0 * (1 - lev_frac), 10.0),
                            ('v', np.zeros(nlev), 8.0),
                            ('w', np.zeros(nlev), 0.2),
                            ('q', q_base, 0.002)):
      x = np.empty((times.size, nlev, nlat, nlon), np.float32)
      for i in range(times.size):
        anom = gen.step(name)
        for j in range(nlev):
          b = base[j] if np.ndim(base) else base
          x[i, j] = b + amp * (0.5 + lev_frac[j]) * anom \
              + amp * 0.2 * np.sin(year_frac[i]) * np.sin(lat2)
      atmos[name] = x

    # Pack temperature as int16 to exercise scale/offset decoding.
    t_raw = atmos.pop('t')
    t_min, t_max = float(t_raw.min()), float(t_raw.max())
    scale = (t_max - t_min) / 60000.0 or 1.0
    t_packed = np.round((t_raw - t_min) / scale - 30000.0).astype(np.int16)

    pressure_path = os.path.join(out_dir,
                                 f'era5_pressure_levels_{month}_{res}.nc')
    variables = {
        name: (('valid_time', 'pressure_level', 'latitude', 'longitude'), x)
        for name, x in atmos.items()}
    variables['t'] = (
        ('valid_time', 'pressure_level', 'latitude', 'longitude'), t_packed)
    netcdf_writer.write_dataset(
        pressure_path,
        {'valid_time': times, 'pressure_level': levels.astype(np.float64),
         'latitude': lat, 'longitude': lon},
        variables,
        dim_attrs={'valid_time':
                   {'units': b'seconds since 1970-01-01'}})
    with h5py.File(pressure_path, 'a') as f:
      f['t'].attrs['scale_factor'] = np.float64(scale)
      f['t'].attrs['add_offset'] = np.float64(t_min + 30000.0 * scale)
    print(f'[synth_era5] wrote {month}: {times.size} steps at {res}')


def synthesize_stats(out_dir: str,
                     levels: Sequence[int] = (
                         PRESSURE_LEVELS_WEATHERBENCH_13),
                     seed: int = 0,
                     prefix: str = 'gencast_stats_') -> None:
  """Writes DeepMind-layout normalization-stats NetCDF files.

  Produces {prefix}{mean,stddev,diffs_stddev}_by_level.nc in the exact
  structure shipped with the published GenCast weights (what the reference
  loads at training/train_helpers.py:190-211): atmospheric variables as
  [level] vectors on a `level` coordinate, surface/forcing variables as
  0-d scalars. Used by the published-weights e2e tests
  (sources.load_stats_netcdf is the consumer).
  """
  from gencast_tpu.data import registry

  os.makedirs(out_dir, exist_ok=True)
  rng = np.random.default_rng(seed)
  levels = np.asarray(levels, np.int32)
  surface_vars = set(registry.GENCAST_TARGET_SURFACE_VARS
                     + registry.FORCING_VARS + registry.STATIC_VARS)
  atmos_vars = registry.TARGET_ATMOSPHERIC_VARS

  def table(lo, hi):
    variables = {}
    for name in atmos_vars:
      variables[name] = (('level',), rng.uniform(
          lo, hi, levels.size).astype(np.float32))
    for name in sorted(surface_vars):
      variables[name] = ((), np.float32(rng.uniform(lo, hi)))
    return variables

  for kind, (lo, hi) in (('mean', (-1.0, 1.0)), ('stddev', (0.5, 3.0)),
                         ('diffs_stddev', (0.1, 1.0))):
    netcdf_writer.write_dataset(
        os.path.join(out_dir, f'{prefix}{kind}_by_level.nc'),
        {'level': levels.astype(np.float64)},
        table(lo, hi),
        global_attrs={'source': 'tools/synth_era5.py synthesize_stats',
                      'seed': seed})
  print(f'[synth_era5] wrote {prefix}*_by_level.nc stats to {out_dir}')


def main(argv=None):
  p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
  p.add_argument('--out', required=True)
  p.add_argument('--resolution', type=float, default=10.0)
  p.add_argument('--months', nargs='+', default=['202001'])
  p.add_argument('--steps_per_month', type=int, default=40)
  p.add_argument('--num_levels', type=int, default=13)
  p.add_argument('--seed', type=int, default=0)
  p.add_argument('--stats', action='store_true',
                 help='also write synthetic published-format stats files')
  args = p.parse_args(argv)
  levels = PRESSURE_LEVELS_WEATHERBENCH_13[-args.num_levels:]
  synthesize(args.out, args.resolution, args.months, args.steps_per_month,
             levels=levels, seed=args.seed)
  if args.stats:
    synthesize_stats(args.out, levels=levels, seed=args.seed)


if __name__ == '__main__':
  main()
