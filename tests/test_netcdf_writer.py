"""Tests for the h5py-based NetCDF4 writer (data/netcdf_writer.py)."""

import sys

import numpy as np
import pytest

h5py = pytest.importorskip('h5py')

from gencast_tpu.data import layout as L
from gencast_tpu.data import netcdf_writer


def test_write_dataset_dimension_scales(tmp_path):
  path = str(tmp_path / 'ds.nc')
  lat = np.array([-45.0, 0.0, 45.0])
  lon = np.array([0.0, 120.0, 240.0])
  data = np.arange(9.0).reshape(3, 3)
  netcdf_writer.write_dataset(
      path, {'lat': lat, 'lon': lon},
      {'field': (('lat', 'lon'), data)},
      global_attrs={'title': 'test'},
      dim_attrs={'lat': {'units': 'degrees_north'}})
  with h5py.File(path, 'r') as f:
    np.testing.assert_array_equal(f['field'][:], data)
    np.testing.assert_array_equal(f['lat'][:], lat)
    assert f.attrs['title'] == 'test'
    assert f['lat'].attrs['units'] == 'degrees_north'
    # NetCDF4 convention: dims are HDF5 dimension scales attached to the
    # data variable's axes.
    assert h5py.h5ds.is_scale(f['lat'].id)
    assert f['field'].dims[0][0] == f['lat']
    assert f['field'].dims[1][0] == f['lon']
    assert f['field'].compression == 'gzip'


def test_write_dataset_shape_validation(tmp_path):
  path = str(tmp_path / 'bad.nc')
  with pytest.raises(ValueError, match='axis 0'):
    netcdf_writer.write_dataset(
        path, {'x': np.arange(3.0)}, {'v': (('x',), np.arange(4.0))})
  with pytest.raises(ValueError, match='unknown dim'):
    netcdf_writer.write_dataset(
        path, {'x': np.arange(3.0)}, {'v': (('y',), np.arange(3.0))})


def test_write_forecast_roundtrip(tmp_path):
  layout = L.build_layout(
      ('2m_temperature', 'temperature'), (500, 1000), 1)
  k, nlat, nlon = 3, 4, 6
  rng = np.random.default_rng(0)
  preds = rng.standard_normal((k, nlat, nlon, layout.num_channels)
                              ).astype(np.float32)
  truth = rng.standard_normal(preds.shape).astype(np.float32)
  lat = np.linspace(-90.0, 90.0, nlat)
  lon = np.arange(0.0, 360.0, 360.0 / nlon)
  path = str(tmp_path / 'forecast.nc')
  netcdf_writer.write_forecast(path, preds, layout, lat, lon, truth=truth,
                               global_attrs={'members': 2})
  with h5py.File(path, 'r') as f:
    assert set(f.keys()) >= {'time', 'lat', 'lon', 'level',
                             '2m_temperature', 'temperature',
                             'target_2m_temperature', 'target_temperature'}
    # Surface var: (time, lat, lon) == the packed channel.
    ch_sfc = layout.var_channels('2m_temperature')[0]
    np.testing.assert_allclose(f['2m_temperature'][:],
                               preds[..., ch_sfc], rtol=0, atol=0)
    # Atmospheric var: (time, level, lat, lon); level-minor packing.
    chs = layout.var_channels('temperature')
    atmos = np.moveaxis(preds[..., chs], 3, 1)
    np.testing.assert_array_equal(f['temperature'][:], atmos)
    np.testing.assert_array_equal(f['target_2m_temperature'][:],
                                  truth[..., ch_sfc])
    np.testing.assert_array_equal(f['level'][:], [500, 1000])
    assert f.attrs['members'] == 2
    assert f['time'].attrs['units'] == b'seconds since forecast start' or \
        f['time'].attrs['units'] == 'seconds since forecast start'


def test_writer_import_error_is_graceful(monkeypatch, tmp_path):
  """evaluate.py catches ImportError from the writer when h5py is absent."""
  monkeypatch.setitem(sys.modules, 'h5py', None)
  layout = L.build_layout(('2m_temperature',), (), 1)
  with pytest.raises(ImportError):
    netcdf_writer.write_forecast(
        str(tmp_path / 'x.nc'), np.zeros((1, 2, 2, 1), np.float32),
        layout, np.array([0.0, 1.0]), np.array([0.0, 1.0]))
