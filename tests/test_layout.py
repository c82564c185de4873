"""Tests for the packed channel layout and loss math."""

import numpy as np
import jax.numpy as jnp
import pytest

from gencast_tpu.data import layout as L
from gencast_tpu.data import registry
from gencast_tpu.ops import losses


def test_gencast_task_channel_counts():
  t = registry.GENCAST_TASK
  inputs = L.build_layout(t.input_variables, t.pressure_levels,
                          t.num_input_frames)
  targets = L.build_layout(t.target_variables, t.pressure_levels, 1)
  forcings = L.build_layout(t.forcing_variables, t.pressure_levels, 1)
  # 4 surface x 2 + 6 atmos x 13 x 2 + 4 forcings x 2 + 2 static x 1
  assert inputs.num_channels == 8 + 156 + 8 + 2
  assert targets.num_channels == 4 + 78
  assert forcings.num_channels == 4
  # Conditioning layout: forcings + noisy targets merged & re-sorted.
  cond = L.build_layout(t.forcing_variables + t.target_variables,
                        t.pressure_levels, 1)
  assert cond.num_channels == 4 + 82


def test_task_registry_matches_reference_variants():
  """The TASKS index carries every reference TaskConfig variant
  (graphcast/graphcast.py:145-171, gencast/gencast.py:57-71)."""
  assert set(registry.TASKS) == {
      'gencast', 'gencast_full', 'graphcast_13', 'graphcast_37',
      'graphcast_13_precip_out'}
  po = registry.GRAPHCAST_TASK_13_PRECIP_OUT
  assert 'total_precipitation_6hr' not in po.input_variables
  assert 'total_precipitation_6hr' in po.target_variables
  assert po.pressure_levels == registry.PRESSURE_LEVELS_WEATHERBENCH_13
  # A precip-out layout is constructible: the target var missing from the
  # inputs maps to "no residual" (-1), the non-residual normalization path.
  m = L.residual_channel_map(
      L.build_layout(po.target_variables, (500,), 1),
      L.build_layout(po.input_variables, (500,), po.num_input_frames))
  tl = L.build_layout(po.target_variables, (500,), 1)
  precip_ch = tl.var_channels('total_precipitation_6hr')
  assert all(m[c] == -1 for c in precip_ch)


def _demo_fields(rng, nlat=5, nlon=8, batch=2, t=2, levels=(500, 850, 1000)):
  nl = len(levels)
  return {
      'temperature': rng.standard_normal((batch, t, nl, nlat, nlon)),
      '2m_temperature': rng.standard_normal((batch, t, nlat, nlon)),
      'land_sea_mask': rng.standard_normal((nlat, nlon)),
  }


def test_pack_unpack_roundtrip():
  rng = np.random.default_rng(0)
  levels = (500, 850, 1000)
  fields = {k: jnp.asarray(v) for k, v in _demo_fields(rng).items()}
  lay = L.build_layout(tuple(fields), levels, 2)
  packed = L.pack(fields, lay)
  assert packed.shape == (2, 5, 8, 2 + 6 + 1)
  out = L.unpack(packed, lay)
  for k in fields:
    if registry.is_static(k):
      np.testing.assert_allclose(out[k][0], fields[k], rtol=1e-6)
    else:
      np.testing.assert_allclose(out[k], fields[k], rtol=1e-6)


def test_pack_order_is_sorted_time_major_level_minor():
  lay = L.build_layout(('temperature', '2m_temperature'), (500, 850), 2)
  # sorted names: 2m_temperature first.
  assert lay.var_names == ('2m_temperature', 'temperature')
  # 2m_temperature: channels 0..1 (t0, t1); temperature: t-major, level-minor.
  np.testing.assert_array_equal(lay.channel_time, [0, 1, 0, 0, 1, 1])
  np.testing.assert_array_equal(lay.channel_level, [-1, -1, 0, 1, 0, 1])


def test_residual_channel_map():
  inputs = L.build_layout(('2m_temperature', 'temperature', 'land_sea_mask'),
                          (500, 850), 2)
  targets = L.build_layout(('2m_temperature', 'temperature', 'new_var'),
                           (500, 850), 1)
  m = L.residual_channel_map(targets, inputs)
  # target order: 2m_temperature, new_var, temperature(l0, l1)
  t2m_last = inputs.var_channels('2m_temperature')[-1]
  temp = inputs.var_channels('temperature')
  # input temperature channels: t0l0 t0l1 t1l0 t1l1 -> last frame = [2], [3]
  np.testing.assert_array_equal(m, [t2m_last, -1, temp[2], temp[3]])


def test_weighted_mse_matches_reference_formula():
  """Packed loss == per-variable lat/level-weighted mean, weighted sum."""
  rng = np.random.default_rng(1)
  levels = (100, 500, 1000)
  nlat, nlon, batch = 7, 10, 3
  lat = np.linspace(-90 + 180 / 14, 90 - 180 / 14, nlat)
  names = ('2m_temperature', 'temperature')
  lay = L.build_layout(names, levels, 1)
  pred = {'2m_temperature': rng.standard_normal((batch, 1, nlat, nlon)),
          'temperature': rng.standard_normal((batch, 1, 3, nlat, nlon))}
  targ = {'2m_temperature': rng.standard_normal((batch, 1, nlat, nlon)),
          'temperature': rng.standard_normal((batch, 1, 3, nlat, nlon))}
  var_w = {'2m_temperature': 0.1}

  latw = L.latitude_weights(lat)
  cw, dw = L.loss_channel_weights(lay, var_w)
  got = losses.weighted_mse(
      L.pack({k: jnp.asarray(v) for k, v in pred.items()}, lay),
      L.pack({k: jnp.asarray(v) for k, v in targ.items()}, lay),
      jnp.asarray(latw), jnp.asarray(cw))

  # Direct reference-style computation.
  lvl = np.asarray(levels, dtype=np.float64)
  lvl_w = lvl / lvl.mean()
  e_sfc = ((pred['2m_temperature'] - targ['2m_temperature']) ** 2
           * latw[None, None, :, None]).mean(axis=(1, 2, 3))
  e_atm = ((pred['temperature'] - targ['temperature']) ** 2
           * latw[None, None, None, :, None]
           * lvl_w[None, None, :, None, None]).mean(axis=(1, 2, 3, 4))
  want = 0.1 * e_sfc + 1.0 * e_atm
  np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

  diag = losses.per_variable_diagnostics(
      L.pack({k: jnp.asarray(v) for k, v in pred.items()}, lay),
      L.pack({k: jnp.asarray(v) for k, v in targ.items()}, lay),
      jnp.asarray(latw), lay, dw)
  np.testing.assert_allclose(np.asarray(diag['2m_temperature']), e_sfc,
                             rtol=1e-5)
  np.testing.assert_allclose(np.asarray(diag['temperature']), e_atm,
                             rtol=1e-5)


def test_latitude_weights_pole_ratio():
  """Pole cell area -> 1/8 of neighbor in the small-angle limit
  (the property the reference tests for its pole handling)."""
  lat = np.arange(-90.0, 90.0 + 1e-9, 0.25)
  w = L.latitude_weights(lat)
  ratio = w[0] / w[1]
  assert abs(ratio - 1 / 8) < 1e-3
  np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-6)


def test_latitude_weights_without_poles():
  lat = np.arange(-89.0, 89.0 + 1e-9, 2.0)
  w = L.latitude_weights(lat)
  np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-6)
  np.testing.assert_allclose(w / w.mean(),
                             np.cos(np.deg2rad(lat))
                             / np.cos(np.deg2rad(lat)).mean(), rtol=1e-5)


def test_stats_vectors():
  lay = L.build_layout(('2m_temperature', 'temperature'), (500, 850), 1)
  stats = L.Stats(
      mean={'2m_temperature': np.asarray(280.0),
            'temperature': np.asarray([250.0, 270.0])},
      std={'2m_temperature': np.asarray(15.0),
           'temperature': np.asarray([10.0, 12.0])},
      diffs_std={'2m_temperature': np.asarray(2.0),
                 'temperature': np.asarray([1.0, 1.5])})
  np.testing.assert_array_equal(L.channel_locations(lay, stats),
                                [280.0, 250.0, 270.0])
  np.testing.assert_array_equal(L.channel_scales(lay, stats),
                                [15.0, 10.0, 12.0])
  np.testing.assert_array_equal(L.channel_residual_scales(lay, stats),
                                [2.0, 1.0, 1.5])
