"""Convert ERA5 monthly NetCDF files into gencast_tpu npz shards.

Reads CDS-download NetCDF (via h5py, no xarray needed) and writes the
Era5NpzSource layout: era5_YYYYMM.npz shards + statics.npz + manifest.json.

Usage:
  python tools/convert_era5.py --in /data/era5_nc --out /data/era5_npz \
      --resolution 2.5 --levels 13
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gencast_tpu.data import era5_netcdf, registry  # noqa: E402


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--in', dest='inp', required=True)
  p.add_argument('--out', required=True)
  p.add_argument('--resolution', type=float, default=2.5)
  p.add_argument('--levels', type=int, default=13, choices=[13, 25, 37])
  args = p.parse_args()

  levels = registry.PRESSURE_LEVELS[args.levels]
  months = era5_netcdf.find_month_files(args.inp, args.resolution)
  if not months:
    raise SystemExit(f'no ERA5 monthly files found under {args.inp}')
  os.makedirs(args.out, exist_ok=True)

  lat = lon = None
  for ym, ppath, spath in months:
    data, times, lat, lon = era5_netcdf.read_month(ppath, spath,
                                                   levels=levels)
    out_path = os.path.join(args.out, f'era5_{ym}.npz')
    np.savez_compressed(out_path, timestamps=times, **data)
    print(f'wrote {out_path}: {sorted(data)} T={len(times)}')

  res = f'{args.resolution:.2f}deg'
  static_path = os.path.join(args.inp, f'era5_static_{res}.nc')
  statics = {}
  if os.path.exists(static_path):
    statics, _, _ = era5_netcdf.read_static(static_path)
  np.savez_compressed(os.path.join(args.out, 'statics.npz'), **statics)

  with open(os.path.join(args.out, 'manifest.json'), 'w') as f:
    json.dump({'lat': np.asarray(lat).tolist(),
               'lon': np.asarray(lon).tolist(),
               'pressure_levels': list(levels),
               'months': [m for m, _, _ in months]}, f)
  print(f'manifest + statics written to {args.out}')


if __name__ == '__main__':
  main()
