"""Benchmark: denoiser forward steps/sec on the flagship nano-GenCast model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no quantitative numbers (README.md:19, BASELINE.md),
so vs_baseline is null.

Secondary diagnostics (full sampler wall-clock) go to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
  import flax.nnx as nnx
  import jax
  import jax.numpy as jnp

  from gencast_tpu import configs

  model, statics = configs.build_gencast(configs.NANO, rngs=nnx.Rngs(0))
  graphdef, state = nnx.split(model)
  d = model.denoiser
  nlat, nlon = statics.grid_lat.shape[0], statics.grid_lon.shape[0]
  rng = np.random.default_rng(0)

  def arr(c):
    return jnp.asarray(rng.standard_normal((1, nlat, nlon, c)), jnp.float32)

  inputs = arr(d.input_layout.num_channels)
  targets = arr(d.target_layout.num_channels)
  forcings = arr(d.forcing_layout.num_channels)
  sigma = jnp.ones((1,), jnp.float32)

  @jax.jit
  def denoise(state, inputs, targets, sigma, forcings):
    m = nnx.merge(graphdef, state)
    return m(inputs, targets, sigma, forcings)

  t0 = time.time()
  out = jax.block_until_ready(denoise(state, inputs, targets, sigma,
                                      forcings))
  compile_s = time.time() - t0
  print(f'compile: {compile_s:.1f}s out={out.shape}', file=sys.stderr)

  n_iter = 20
  t0 = time.time()
  for _ in range(n_iter):
    out = denoise(state, inputs, targets, sigma, forcings)
  jax.block_until_ready(out)
  dt = (time.time() - t0) / n_iter
  steps_per_sec = 1.0 / dt
  print(f'denoiser fwd: {dt*1000:.2f} ms/step', file=sys.stderr)

  # Secondary: one full 20-level DPM-Solver++2S sampling (39 denoiser calls).
  @jax.jit
  def sample(state, inputs, forcings, key):
    m = nnx.merge(graphdef, state)
    return m.sample(inputs, forcings, key)

  key = jax.random.PRNGKey(0)
  t0 = time.time()
  s = jax.block_until_ready(sample(state, inputs, forcings, key))
  print(f'sampler compile+run: {time.time()-t0:.1f}s', file=sys.stderr)
  t0 = time.time()
  s = jax.block_until_ready(sample(state, inputs, forcings, key))
  print(f'sampler (20 levels): {time.time()-t0:.2f}s/forecast-step',
        file=sys.stderr)

  print(json.dumps({
      'metric': 'nano_denoiser_steps_per_sec',
      'value': round(steps_per_sec, 3),
      'unit': 'steps/s/chip',
      'vs_baseline': None,
  }))


if __name__ == '__main__':
  main()
