"""Tests for the h5py-based ERA5 NetCDF reader using synthetic files."""

import os

import numpy as np
import pytest

h5py = pytest.importorskip('h5py')

from gencast_tpu.data import era5_netcdf, registry

LAT = np.arange(90.0, -90.0 - 1e-6, -30.0)   # descending, like raw ERA5
LON = np.arange(0.0, 360.0, 30.0)
LEVELS = np.array([500.0, 850.0, 1000.0])
HOURS = np.array([0.0, 12.0, 24.0, 36.0])    # hours since base


def _dimscale(f, name, data):
  d = f.create_dataset(name, data=data)
  d.make_scale(name)
  return d


def _make_pressure_file(path):
  with h5py.File(path, 'w') as f:
    t = _dimscale(f, 'valid_time', HOURS)
    t.attrs['units'] = np.bytes_(b'hours since 2020-01-01')
    l = _dimscale(f, 'pressure_level', LEVELS)
    la = _dimscale(f, 'latitude', LAT)
    lo = _dimscale(f, 'longitude', LON)
    rng = np.random.default_rng(0)
    truth = 250 + 20 * rng.standard_normal(
        (HOURS.size, LEVELS.size, LAT.size, LON.size))
    # Pack like ERA5: int16 with scale/offset.
    scale, offset = 0.01, 250.0
    packed = np.round((truth - offset) / scale).astype(np.int16)
    v = f.create_dataset('t', data=packed)
    v.attrs['scale_factor'] = np.float64(scale)
    v.attrs['add_offset'] = np.float64(offset)
    for i, dim in enumerate((t, l, la, lo)):
      v.dims[i].attach_scale(dim)
    return truth


def _make_single_file(path):
  with h5py.File(path, 'w') as f:
    t = _dimscale(f, 'valid_time', HOURS)
    t.attrs['units'] = np.bytes_(b'hours since 2020-01-01')
    la = _dimscale(f, 'latitude', LAT)
    lo = _dimscale(f, 'longitude', LON)
    rng = np.random.default_rng(1)
    fields = {}
    for raw in ('t2m', 'msl', 'u10', 'v10'):
      x = rng.standard_normal((HOURS.size, LAT.size, LON.size)).astype(
          np.float32)
      v = f.create_dataset(raw, data=x)
      for i, dim in enumerate((t, la, lo)):
        v.dims[i].attach_scale(dim)
      fields[raw] = x
    # Cumulative precip to be differenced.
    tp = np.cumsum(rng.random((HOURS.size, LAT.size, LON.size)),
                   axis=0).astype(np.float32)
    v = f.create_dataset('tp', data=tp)
    for i, dim in enumerate((t, la, lo)):
      v.dims[i].attach_scale(dim)
    fields['tp'] = tp
    return fields


def _make_static_file(path):
  with h5py.File(path, 'w') as f:
    la = _dimscale(f, 'latitude', LAT)
    lo = _dimscale(f, 'longitude', LON)
    rng = np.random.default_rng(2)
    lsm = (rng.random((LAT.size, LON.size)) > 0.5).astype(np.float32)
    v = f.create_dataset('lsm', data=lsm)
    v.dims[0].attach_scale(la)
    v.dims[1].attach_scale(lo)
    return lsm


@pytest.fixture()
def era5_dir(tmp_path):
  d = str(tmp_path)
  truth_t = _make_pressure_file(
      os.path.join(d, 'era5_pressure_levels_202001_2.50deg.nc'))
  singles = _make_single_file(
      os.path.join(d, 'era5_single_levels_202001_2.50deg.nc'))
  lsm = _make_static_file(os.path.join(d, 'era5_static_2.50deg.nc'))
  return d, truth_t, singles, lsm


def test_read_month_standardization(era5_dir):
  d, truth_t, singles, _ = era5_dir
  months = era5_netcdf.find_month_files(d, 2.5)
  assert len(months) == 1 and months[0][0] == '202001'
  data, times, lat, lon = era5_netcdf.read_month(months[0][1], months[0][2])
  # Time decoded: hours since 2020-01-01.
  base = (np.datetime64('2020-01-01') - np.datetime64('1970-01-01')
          ) / np.timedelta64(1, 's')
  np.testing.assert_allclose(times, base + HOURS * 3600)
  # Latitude flipped ascending; values flipped accordingly; packing decoded.
  assert lat[0] < lat[-1]
  np.testing.assert_allclose(data['temperature'],
                             truth_t[:, :, ::-1, :], atol=0.011)
  np.testing.assert_allclose(data['2m_temperature'],
                             singles['t2m'][:, ::-1, :], atol=1e-6)
  # Precip differenced, first frame zero.
  tp12 = data['total_precipitation_12hr']
  np.testing.assert_allclose(tp12[0], 0.0)
  np.testing.assert_allclose(tp12[1:],
                             np.diff(singles['tp'], axis=0)[:, ::-1, :],
                             atol=1e-6)


def test_source_end_to_end(era5_dir):
  d, *_ = era5_dir
  task = registry.TaskSpec(
      input_variables=('2m_temperature', 'temperature', 'year_progress_sin',
                       'land_sea_mask'),
      target_variables=('2m_temperature', 'temperature'),
      forcing_variables=('year_progress_sin',),
      pressure_levels=(500, 850, 1000),
      num_input_frames=2)
  src = era5_netcdf.Era5NetCDFSource(d, task)
  assert len(src) == 2  # 4 frames - 2 input frames
  w = src.sample(0)
  assert w.inputs.shape == (LAT.size, LON.size,
                            src.input_layout.num_channels)
  assert np.isfinite(w.inputs).all()
  assert np.isfinite(w.targets).all()


def test_converter_roundtrip(era5_dir, tmp_path):
  d, *_ = era5_dir
  out = str(tmp_path / 'npz')
  import subprocess, sys
  r = subprocess.run(
      [sys.executable, 'tools/convert_era5.py', '--in', d, '--out', out,
       '--resolution', '2.5', '--levels', '13'],
      capture_output=True, text=True)
  assert r.returncode == 0, r.stderr
  from gencast_tpu.data import sources
  task = registry.TaskSpec(
      input_variables=('2m_temperature', 'land_sea_mask'),
      target_variables=('2m_temperature',),
      forcing_variables=('year_progress_sin',),
      pressure_levels=(500,),
      num_input_frames=2)
  src = sources.Era5NpzSource(out, task)
  assert len(src) == 2
  w = src.sample(0)
  assert np.isfinite(w.inputs).all()


def test_check_era5_validator(era5_dir, tmp_path):
  """tools/check_era5.py passes clean files and fails corrupted ones."""
  import h5py
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      'check_era5', os.path.join(os.path.dirname(__file__), '..',
                                 'tools', 'check_era5.py'))
  check = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(check)

  d, _, _, _ = era5_dir
  # Fixture grid is 30-degree spacing under 2.5deg file naming.
  base = [d, '--resolution', '2.5', '--grid_spacing', '30']
  assert check.main(base + ['--levels', '500', '1000']) == 0

  # Missing level -> non-zero exit.
  assert check.main(base + ['--levels', '725']) == 1

  # Missing variables only fail under --strict (fixture has t but not q).
  assert check.main(base + ['--strict']) == 1

  # Corrupt a file: non-monotone latitude.
  import glob
  import shutil
  bad_dir = str(tmp_path / 'bad')
  shutil.copytree(d, bad_dir)
  ppath = glob.glob(os.path.join(bad_dir, 'era5_pressure_levels_*.nc'))[0]
  with h5py.File(ppath, 'a') as f:
    lat = f['latitude'][...]
    lat[0], lat[1] = lat[1], lat[0]
    f['latitude'][...] = lat
  rc = check.main([bad_dir, '--resolution', '2.5', '--grid_spacing', '30'])
  assert rc == 1
