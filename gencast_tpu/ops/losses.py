"""Packed-array loss functions.

The reference computes a latitude- and pressure-weighted MSE per xarray
variable then a weighted sum (common/losses.py:58-96). Here the same math is
a single fused reduction over a packed [batch, lat, lon, C] tensor using
per-channel weight vectors from `gencast_tpu.data.layout`.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from gencast_tpu.data import layout as layout_lib


def weighted_mse(
    predictions: jnp.ndarray,    # [B, lat, lon, C]
    targets: jnp.ndarray,        # [B, lat, lon, C]
    lat_weights: jnp.ndarray,    # [lat]
    channel_weights: jnp.ndarray,  # [C] (already includes level & var weights
                                   #      and the per-variable channel mean)
    per_sample_scale: jnp.ndarray | None = None,  # [B], e.g. EDM lambda(sigma)
) -> jnp.ndarray:
  """Returns loss per batch element, shape [B]."""
  err = (predictions - targets) ** 2
  err = err * lat_weights.astype(err.dtype)[None, :, None, None]
  # Mean over lat/lon, weighted sum over channels.
  per_chan = err.mean(axis=(1, 2))  # [B, C]
  loss = per_chan @ channel_weights.astype(err.dtype)  # [B]
  if per_sample_scale is not None:
    loss = loss * per_sample_scale.astype(loss.dtype)
  return loss


def per_variable_diagnostics(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    lat_weights: jnp.ndarray,
    layout: layout_lib.ChannelLayout,
    diag_weights: np.ndarray,
) -> Dict[str, jnp.ndarray]:
  """Per-variable (level-weighted, unscaled) losses, each [B]."""
  err = (predictions - targets) ** 2
  err = err * lat_weights.astype(err.dtype)[None, :, None, None]
  per_chan = err.mean(axis=(1, 2)) * jnp.asarray(diag_weights,
                                                 dtype=err.dtype)  # [B, C]
  out = {}
  for name in layout.var_names:
    chans = layout.var_channels(name)
    out[name] = per_chan[:, chans].sum(axis=-1)
  return out
