"""Profile one 1-degree sampler forecast step and print the op breakdown.

Usage: python tools/trace_sampler.py [outdir] [spec]

The sampler (39 preconditioned denoiser calls in one on-device program,
models/gencast.py:175-237) is the inner loop of the north-star ensemble
metric; this tool shows where its device time goes, reusing
trace_qdeg.parse for the perfetto timeline aggregation.
"""

import sys
import time

import jax
import jax.numpy as jnp

from tools.trace_qdeg import parse


def run(outdir: str, spec_name: str = '1deg'):
  from gencast_tpu import configs, utils

  x = jnp.ones((128, 128), jnp.float32)
  float(jnp.dot(x, x).sum())  # scalar readback: block_until_ready is a relay no-op

  spec = configs.SPECS[spec_name]
  fx = utils.sampler_fixture(
      spec, log=lambda m: print(f'[trace] {m}', file=sys.stderr))
  sample, state = fx.sample, fx.state
  inputs, forcings, key = fx.inputs, fx.forcings, fx.key

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
