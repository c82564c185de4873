"""gencast_tpu: a TPU-native weather diffusion-model framework.

A from-scratch rebuild of the capabilities of fgiral000/gencast-flax-nnx
(GenCast EDM diffusion + GraphCast deterministic forecasting), designed
TPU-first:

* Device-side data model is packed arrays with static channel metadata
  (`gencast_tpu.data.layout.ChannelLayout`) instead of xarray-inside-jit.
* Graph construction is an explicit host-side compiler
  (`gencast_tpu.graph.compiler`) emitting frozen static arrays.
* Mesh attention runs on a banded block-sparse layout (RCM-permuted
  icosahedral mesh) with a custom Pallas TPU kernel and a pure-XLA oracle.
* Sampling and autoregressive rollout are single `lax.scan` programs with
  donated state; ensembles scale over a `jax.sharding.Mesh` via shard_map.
"""

__version__ = "0.1.0"

import flax as _flax

# Parameters carry P(None, 'model') partitioning annotations for tensor
# parallelism, but sharding is applied at jit boundaries (see
# gencast_tpu.parallel), not eagerly at variable creation — models must be
# constructible without an active mesh context.
_flax.config.update("flax_always_shard_variable", False)

import os as _os

import jax as _jax

# Persistent compilation cache: the fused sampler program is large (2
# denoiser calls per scan step x 16 transformer blocks) and cold-compiles
# in minutes; cache hits make reruns instant.
_cache_dir = _os.environ.get(
    "GENCAST_TPU_XLA_CACHE",
    _os.path.join(_os.path.expanduser("~/.cache"), "gencast_tpu_xla"))
try:
  _jax.config.update("jax_compilation_cache_dir", _cache_dir)
  # 0.3s (not the 1s default): through the remote TPU relay even the tiny
  # parameter-initializer programs compile at ~0.5s each, and a 0.25-deg
  # model build runs ~50 of them — ~23s of every build that the cache
  # eliminates (profiled 2026-08-17).
  _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
except Exception:  # noqa: BLE001 - older jax without these flags
  pass
