"""Profile one 1-degree sampler forecast step and print the op breakdown.

Usage: python tools/trace_sampler.py [outdir] [spec]

The sampler (39 preconditioned denoiser calls in one on-device program,
models/gencast.py:175-237) is the inner loop of the north-star ensemble
metric; this tool shows where its device time goes, reusing
trace_qdeg.parse for the perfetto timeline aggregation.
"""

import sys
import time

import flax.nnx as nnx
import jax
import jax.numpy as jnp

from tools.trace_qdeg import parse


def run(outdir: str, spec_name: str = '1deg'):
  from gencast_tpu import configs
  from gencast_tpu.models import casting

  x = jnp.ones((128, 128), jnp.float32)
  jax.block_until_ready(jnp.dot(x, x))

  spec = configs.SPECS[spec_name]
  t0 = time.time()
  model, statics = configs.build_gencast(spec, rngs=nnx.Rngs(0))
  if spec.cast_bf16:
    model = casting.Bfloat16Cast(model)
  print(f'[trace] model build: {time.time()-t0:.1f}s', file=sys.stderr)
  d = (model.predictor if hasattr(model, 'predictor') else model).denoiser
  nlat, nlon = statics.grid_lat.shape[0], statics.grid_lon.shape[0]

  inputs = jax.random.normal(
      jax.random.PRNGKey(0), (1, nlat, nlon, d.input_layout.num_channels),
      jnp.float32)
  forcings = jax.random.normal(
      jax.random.PRNGKey(1), (1, nlat, nlon, d.forcing_layout.num_channels),
      jnp.float32)
  key = jax.random.PRNGKey(2)
  graphdef, state = nnx.split(model)

  @jax.jit
  def sample(state, inputs, forcings, k):
    m = nnx.merge(graphdef, state)
    return m.sample(inputs, forcings, k).sum()

  # float() readbacks: the relay acks block_until_ready without
  # completing the dispatch; only a host scalar read bounds wall time.
  t0 = time.time()
  float(sample(state, inputs, forcings, key))
  print(f'[trace] compile+warm: {time.time()-t0:.1f}s', file=sys.stderr)
  float(sample(state, inputs + 1.0, forcings, key))

  jax.profiler.start_trace(outdir)
  t0 = time.time()
  float(sample(state, inputs + 2.0, forcings, key))
  wall = time.time() - t0
  jax.profiler.stop_trace()
  print(f'[trace] profiled sampler wall: {wall:.3f}s', file=sys.stderr)


if __name__ == '__main__':
  out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/sampler_trace'
  spec = sys.argv[2] if len(sys.argv) > 2 else '1deg'
  run(out, spec)
  parse(out, top=60)
