"""Benchmark: denoiser forward steps/sec on the flagship nano-GenCast model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no quantitative numbers (README.md:19, BASELINE.md),
so vs_baseline is null.

Methodology: the denoiser is chained through an on-device lax.scan (output
feeds the next call's noisy-targets input) and timings are differenced
between a 1-rep and an N-rep program with a scalar host readback. This is
required on this hardware setup: per-call dispatch timings through the
remote TPU relay are unreliable (repeated identical dispatches get elided).

Secondary diagnostics (full sampler wall-clock) go to stderr.
"""

import json
import sys
import time

import numpy as np

REPS = 21


def _timed_loop(step_fn, x0, reps, iters=3):
  """Wall time of `reps` chained step_fn applications inside one jit."""
  import jax

  @jax.jit
  def loop(x):
    def body(c, _):
      return step_fn(c), ()
    c, _ = jax.lax.scan(body, x, None, length=reps)
    return c.sum()

  float(loop(x0))  # compile + warm
  times = []
  for i in range(iters):
    t0 = time.time()
    float(loop(x0 + float(i)))
    times.append(time.time() - t0)
  return min(times)


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
  m = nnx.merge(graphdef, state)

  def step(noisy):
    # Chain the denoiser through its own output (sampler-like data flow).
    return m(inputs, noisy, sigma, forcings)

  t1 = _timed_loop(step, targets, 1)
  tn = _timed_loop(step, targets, REPS)
  dt = (tn - t1) / (REPS - 1)
  steps_per_sec = 1.0 / dt
  print(f'denoiser fwd: {dt*1000:.2f} ms/step '
        f'(t1={t1*1000:.0f}ms t{REPS}={tn*1000:.0f}ms)', file=sys.stderr)

  # Secondary: one full 20-level DPM-Solver++2S sampling (39 denoiser calls).
  @jax.jit
  def sample(state, inputs, forcings, key):
    mm = nnx.merge(graphdef, state)
    return mm.sample(inputs, forcings, key).sum()

  key = jax.random.PRNGKey(0)
  t0 = time.time()
  float(sample(state, inputs, forcings, key))
  print(f'sampler compile+run: {time.time()-t0:.1f}s', file=sys.stderr)
  t0 = time.time()
  float(sample(state, inputs + 1.0, forcings, key))
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
