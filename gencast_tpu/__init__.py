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
