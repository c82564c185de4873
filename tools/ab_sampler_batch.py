"""A/B ensemble-member batching in the 1-degree sampler on the real chip.

The north-star metric (BASELINE.md: 50-member 30-step 1-degree ensemble on
v5e-64) divides members over chips; if one chip can sample B members in
less than B times the 1-member wall-clock, the per-chip member count beats
the ensemble-axis layout. Round-3 established TRAIN batching does not pay
(fwd+bwd, 46.7 -> 42.9 samples/s at nano b=8; 1-degree b=2 regresses);
the sampler is forward-only with different arithmetic intensity, so it
gets its own measurement. Reference role: common/rollout.py:78-202 shards
members one-per-device via pmap and never batches within a device.

Usage: python tools/ab_sampler_batch.py [batch] [spec]
       (one batch size per process; the relay serializes TPU jobs and a
       fresh process isolates compile-cache and HBM effects)

Timing: the sampler is a 39-call on-device fori/scan program dispatched
once, seconds long — per-call wall timing is safe (far above relay
dispatch noise). iters=2, best-of reported like bench.py's sampler
sections.
"""

import sys
import time

import jax
import jax.numpy as jnp

from gencast_tpu import configs, utils


def probe():
  t0 = time.time()
  x = jnp.ones((128, 128), jnp.float32)
  float(jnp.dot(x, x).sum())  # scalar readback: block_until_ready is a relay no-op
  print(f'[probe] relay up in {time.time()-t0:.1f}s', file=sys.stderr)


def main():
  batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
  spec_name = sys.argv[2] if len(sys.argv) > 2 else 'onedeg'
  spec = {'onedeg': configs.ONE_DEG, 'nano': configs.NANO}[spec_name]
  print(f'[ab] sampler batch={batch} spec={spec_name}', file=sys.stderr)

  probe()
  fx = utils.sampler_fixture(
      spec, batch=batch, log=lambda m: print(f'[ab] {m}', file=sys.stderr))
  sample, state = fx.sample, fx.state
  inputs, forcings, key = fx.inputs, fx.forcings, fx.key

  # float() readback, NOT block_until_ready: the relay acks readiness
  # without completing the dispatch (a block_until_ready-timed sampler
  # call "takes" 1 ms), so only a host scalar readback bounds the wall
  # time — same methodology as bench.py's _timed.
  t0 = time.time()
  float(sample(state, inputs, forcings, key))
  print(f'[ab] first call (compile): {time.time()-t0:.1f}s', file=sys.stderr)

  times = []
  for i in range(3):
    t0 = time.time()
    float(sample(state, inputs + float(i + 1), forcings, key))
    times.append(time.time() - t0)
  best = min(times)
  print(f'[ab] times: {["%.2f" % t for t in times]}', file=sys.stderr)
  print(f'[ab] batch={batch}: {best:.2f} s/forecast-step '
        f'({best / batch:.2f} s/member, {batch / best:.3f} members/s)')


if __name__ == '__main__':
  main()
