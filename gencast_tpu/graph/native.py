"""ctypes loader/builder for the native graph-compiler kernels.

Compiles gencast_tpu/graph/_native/*.cpp with g++ on first use (cached in
the package cache dir, keyed by source hash) and exposes them through
ctypes. Every caller has a pure-numpy fallback, so the native path is a
performance feature, not a requirement.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '_native')
_CACHE_DIR = os.path.join(
    os.environ.get('GENCAST_TPU_CACHE', os.path.expanduser('~/.cache')),
    'gencast_tpu', 'native')

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
  src = os.path.join(_NATIVE_DIR, 'containing_triangle.cpp')
  with open(src, 'rb') as f:
    key = hashlib.sha256(f.read()).hexdigest()[:16]
  so_path = os.path.join(_CACHE_DIR, f'gt_native_{key}.so')
  if not os.path.exists(so_path):
    os.makedirs(_CACHE_DIR, exist_ok=True)
    tmp = so_path + f'.tmp{os.getpid()}'
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-fopenmp',
           '-o', tmp, src]
    try:
      subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
      # Retry without OpenMP (not all toolchains ship libgomp).
      try:
        subprocess.run(['g++', '-O3', '-shared', '-fPIC', '-o', tmp, src],
                       check=True, capture_output=True, text=True)
      except Exception:
        return None
    os.replace(tmp, so_path)
  lib = ctypes.CDLL(so_path)
  lib.gt_containing_triangle.restype = ctypes.c_int
  lib.gt_containing_triangle.argtypes = [
      ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
      ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
      ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
      ctypes.c_double,
      ctypes.POINTER(ctypes.c_int64),
  ]
  return lib


def get_lib() -> Optional[ctypes.CDLL]:
  """The native library, building it on first call; None if unavailable."""
  global _lib, _build_failed
  if _lib is not None or _build_failed:
    return _lib
  with _lock:
    if _lib is None and not _build_failed:
      _lib = _build()
      if _lib is None:
        _build_failed = True
  return _lib


def containing_triangle(points: np.ndarray, vertices: np.ndarray,
                        faces: np.ndarray) -> Optional[np.ndarray]:
  """Native containing-triangle query; None if the library is unavailable."""
  lib = get_lib()
  if lib is None:
    return None
  pts = np.ascontiguousarray(points, dtype=np.float64)
  verts = np.ascontiguousarray(vertices, dtype=np.float64)
  fcs = np.ascontiguousarray(faces, dtype=np.int32)
  out = np.empty(pts.shape[0], dtype=np.int64)
  # Cell size ~ the largest face extent so ring-1 lookups almost always hit.
  v = verts[fcs]
  extent = float(np.max(v.max(axis=1) - v.min(axis=1)))
  cell = max(extent * 1.1, 1e-3)
  rc = lib.gt_containing_triangle(
      pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), pts.shape[0],
      verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), verts.shape[0],
      fcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), fcs.shape[0],
      cell, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
  if rc != 0 or (out < 0).any():
    return None
  return out
