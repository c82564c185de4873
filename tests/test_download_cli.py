"""Offline tests for the ERA5 download CLI (the network path needs CDS
credentials; the request-building and file-naming contract is testable)."""

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dry_run_requests_cover_task_and_match_source_naming():
  r = subprocess.run(
      [sys.executable, os.path.join(REPO, 'tools', 'download_era5.py'),
       '--out_dir', '/tmp/era5', '--start', '2019-11', '--end', '2020-02',
       '--resolution', '1.0', '--task', 'gencast_full', '--dry_run'],
      capture_output=True, text=True, cwd=REPO, timeout=120)
  assert r.returncode == 0, r.stderr
  plans = [json.loads(l) for l in r.stdout.splitlines()]
  # 1 static + 4 months x 2 datasets.
  assert len(plans) == 9
  kinds = [p['kind'] for p in plans]
  assert kinds.count('single_levels') == 4
  assert kinds.count('pressure_levels') == 4

  by_kind = {p['kind']: p for p in plans}
  # File naming matches Era5NetCDFSource's discovery globs.
  assert by_kind['static']['target'].endswith('era5_static_1.00deg.nc')
  assert 'era5_pressure_levels_201911_1.00deg.nc' in \
      ' '.join(p['target'] for p in plans)
  # Month range crosses the year boundary correctly.
  assert any('202002' in p['target'] for p in plans)

  pl = by_kind['pressure_levels']['request']
  assert set(pl['pressure_level']) == {
      '50', '100', '150', '200', '250', '300', '400', '500', '600',
      '700', '850', '925', '1000'}
  assert 'temperature' in pl['variable']
  sl = by_kind['single_levels']['request']
  # Derived names map back to CDS naming; generated forcings excluded.
  assert 'total_precipitation' in sl['variable']
  assert 'sea_surface_temperature' in sl['variable']
  assert not any('progress' in v for v in sl['variable'])
  assert sl['time'] == ['00:00', '12:00']
  st = by_kind['static']['request']
  assert set(st['variable']) == {'geopotential', 'land_sea_mask'}


def test_dry_run_graphcast_includes_tisr_forcing():
  r = subprocess.run(
      [sys.executable, os.path.join(REPO, 'tools', 'download_era5.py'),
       '--out_dir', '/tmp/era5', '--start', '2019-01', '--end', '2019-01',
       '--resolution', '0.25', '--task', 'graphcast_13', '--dry_run'],
      capture_output=True, text=True, cwd=REPO, timeout=120)
  assert r.returncode == 0, r.stderr
  plans = [json.loads(l) for l in r.stdout.splitlines()]
  sl = next(p for p in plans if p['kind'] == 'single_levels')
  assert 'toa_incident_solar_radiation' in sl['request']['variable']
  assert sl['request']['grid'] == '0.25/0.25'
