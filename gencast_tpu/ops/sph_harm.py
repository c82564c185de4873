"""Real spherical harmonics on lat/lon grids, as MXU-friendly einsums.

Replaces the reference's dependency on `dinosaur.spherical_harmonic`
(gencast/samplers_utils.py:14-330) for sampling isotropic Gaussian-process
noise on the sphere. The synthesis (inverse transform) is two dense matmuls
— Legendre contraction over total wavenumber l, then Fourier contraction
over zonal wavenumber m — which XLA tiles straight onto the MXU, so noise
sampling stays inside jit (and inside the fused sampling scan).

Conventions: orthonormal real spherical harmonics
  Y_{l0}        = Q_{l0}(x)
  Y_{lm}^{cos}  = sqrt(2) Q_{lm}(x) cos(m phi),  m >= 1
  Y_{lm}^{sin}  = sqrt(2) Q_{lm}(x) sin(m phi)
with Q_{lm} = N_{lm} P_l^m and integral of Y^2 over the sphere = 1. Sampling
coefficients iid N(0, 4 pi power_l / (2l+1)) per basis function yields noise
whose pointwise marginal variance equals sum_l power_l and whose law is
rotation-invariant.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def legendre_table(x: np.ndarray, max_l: int) -> np.ndarray:
  """Normalized associated Legendre values, shape [L+1, L+1, len(x)].

  Entry [l, m, j] is sqrt(2 - delta_{m0}) * N_{lm} P_l^m(x_j) with
  N_{lm} = sqrt((2l+1)/(4pi) (l-m)!/(l+m)!) and the Condon-Shortley phase.
  Entries with m > l are zero. Uses the standard stable normalized
  recursions, vectorized over x, in float64.
  """
  x = np.asarray(x, dtype=np.float64)
  nx = x.shape[0]
  lmax = max_l
  p = np.zeros((lmax + 1, lmax + 1, nx), dtype=np.float64)
  s = np.sqrt(np.maximum(0.0, 1.0 - x * x))  # sin(theta)

  # Diagonal: Q_{mm} (sequential in m).
  p[0, 0] = 1.0 / np.sqrt(4.0 * np.pi)
  for m in range(1, lmax + 1):
    p[m, m] = -np.sqrt((2 * m + 1) / (2.0 * m)) * s * p[m - 1, m - 1]

  # Upward recursion in l, vectorized over all m < l (O(L) numpy calls
  # instead of O(L^2) — the difference between ~10 minutes and ~2 seconds
  # at the 0.25-degree scale, L=719).
  for l in range(1, lmax + 1):
    # First off-diagonal: Q_{l, l-1} = x sqrt(2l+1) Q_{l-1, l-1}.
    p[l, l - 1] = x * np.sqrt(2.0 * l + 1.0) * p[l - 1, l - 1]
    if l >= 2:
      m = np.arange(l - 1, dtype=np.float64)
      a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
      b = np.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0))
      p[l, :l - 1] = a[:, None] * (x[None, :] * p[l - 1, :l - 1]
                                   - b[:, None] * p[l - 2, :l - 1])

  # Fold in sqrt(2) for m >= 1 (real-harmonic normalization).
  p[:, 1:] *= np.sqrt(2.0)
  return p


@dataclasses.dataclass(frozen=True)
class SphericalHarmonicBasis:
  """Precomputed synthesis operators for a fixed lat/lon grid.

  legendre: [L+1, L+1, num_lat] float32  (l, m, lat)
  fourier:  [2, L+1, num_lon]  float32  (cos(m phi), sin(m phi))
  """
  legendre: jnp.ndarray
  fourier: jnp.ndarray
  max_l: int

  @property
  def num_lat(self) -> int:
    return self.legendre.shape[-1]

  @property
  def num_lon(self) -> int:
    return self.fourier.shape[-1]


@functools.lru_cache(maxsize=8)
def _basis_cached(lat_key: Tuple[float, ...], lon_key: Tuple[float, ...],
                  max_l: int, dtype_name: str) -> SphericalHarmonicBasis:
  lat = np.asarray(lat_key)
  lon = np.asarray(lon_key)
  x = np.sin(np.deg2rad(lat))
  leg = legendre_table(x, max_l)
  phi = np.deg2rad(lon)
  m = np.arange(max_l + 1)[:, None]
  four = np.stack([np.cos(m * phi[None]), np.sin(m * phi[None])])
  dtype = np.dtype(dtype_name)
  return SphericalHarmonicBasis(
      legendre=jnp.asarray(leg.astype(dtype)),
      fourier=jnp.asarray(four.astype(dtype)),
      max_l=max_l)


def basis_for_grid(lat_deg: Sequence[float], lon_deg: Sequence[float],
                   max_l: int | None = None,
                   dtype=np.float32) -> SphericalHarmonicBasis:
  """Basis resolving wavenumbers up to max_l (default: num_lon//2 - 1,
  the maximum the grid resolves — matching the reference's choice
  (gencast/samplers_utils.py:86, 336))."""
  lon = tuple(float(v) for v in lon_deg)
  lat = tuple(float(v) for v in lat_deg)
  if max_l is None:
    max_l = len(lon) // 2 - 1
  return _basis_cached(lat, lon, max_l, np.dtype(dtype).name)


def synthesize(coeffs: jnp.ndarray,
               basis: SphericalHarmonicBasis) -> jnp.ndarray:
  """Inverse transform: [..., 2, L+1, L+1] (s=cos/sin, l, m) -> [..., lat, lon].

  With a reduced-precision basis (e.g. bf16, halving the 1.5GB Legendre
  table at 0.25 degrees) the contractions still accumulate in f32 on the
  MXU and the result is returned at the coefficients' dtype.
  """
  out_dtype = coeffs.dtype
  bt = basis.legendre.dtype
  acc = {'preferred_element_type': jnp.float32} if bt != out_dtype else {}
  # Contract l: [..., s, m, lat]
  g = jnp.einsum('...slm,lmj->...smj', coeffs.astype(bt), basis.legendre,
                 **acc)
  # Contract m and s: [..., lat, lon]
  return jnp.einsum('...smj,smi->...ji', g.astype(bt), basis.fourier,
                    **acc).astype(out_dtype)


def sample_isotropic(key: jax.Array,
                     power_spectrum: jnp.ndarray,
                     batch_shape: Tuple[int, ...],
                     basis: SphericalHarmonicBasis,
                     dtype=jnp.float32) -> jnp.ndarray:
  """Isotropic GP noise with the given spectrum, shape [*batch, lat, lon].

  power_spectrum: [L+1] desired power per total wavenumber; the pointwise
  marginal variance of the result is sum(power_spectrum).
  """
  lmax = basis.max_l
  l_idx = jnp.arange(lmax + 1)
  m_idx = jnp.arange(lmax + 1)
  power = power_spectrum.astype(jnp.float32)
  # Std per (l) basis function; valid coefficients: m <= l, and for m == 0
  # only the cos (s=0) entry.
  sigma_l = jnp.sqrt(4.0 * jnp.pi * power / (2.0 * l_idx + 1.0))
  tri = (m_idx[None, :] <= l_idx[:, None]).astype(jnp.float32)  # [L+1, L+1]
  sin_mask = tri * (m_idx[None, :] > 0)
  mask = jnp.stack([tri, sin_mask])  # [2, L+1, L+1]
  scale = mask * sigma_l[None, :, None]
  z = jax.random.normal(key, batch_shape + scale.shape, dtype=jnp.float32)
  return synthesize(z * scale, basis).astype(dtype)


def unit_white_noise(key: jax.Array, batch_shape: Tuple[int, ...],
                     basis: SphericalHarmonicBasis,
                     dtype=jnp.float32) -> jnp.ndarray:
  """Unit-marginal-variance isotropic noise with a flat power spectrum
  (the reference's spherical_white_noise_like,
  gencast/samplers_utils.py:333-346)."""
  n = basis.max_l + 1
  power = jnp.full((n,), 1.0 / n, dtype=jnp.float32)
  return sample_isotropic(key, power, batch_shape, basis, dtype=dtype)
