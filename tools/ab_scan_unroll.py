"""A/B the transformer layer-scan unroll factor on the real chip.

Hypothesis: at 1 degree the sampler spends ~62% of device time inside the
layer-scan while-loop (tools/trace_sampler.py round-4 profile); unrolling
k blocks per scan iteration lets XLA fuse across layer boundaries
(residual add into the next LN read) and amortize loop overhead, at the
cost of a k-times larger loop body to compile.

Usage (ONE variant per process — fresh process isolates compile caches and
relay state; run variants back to back, never concurrently):

  python tools/ab_scan_unroll.py 1 [spec] [mode]
  python tools/ab_scan_unroll.py 4 [spec] [mode]

spec defaults to '1deg'; mode is 'sampler' (default: one full forecast
step, 39 denoiser calls, float-readback timed like bench.py) or 'train'
(differenced 1-vs-5-rep on-device scan of the train step).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def probe():
  t0 = time.time()
  x = jnp.ones((128, 128), jnp.float32)
  float(jnp.dot(x, x).sum())  # scalar readback: block_until_ready lies
  print(f'[ab] relay up in {time.time()-t0:.1f}s', file=sys.stderr)


def main():
  unroll = int(sys.argv[1]) if len(sys.argv) > 1 else 1
  spec_name = sys.argv[2] if len(sys.argv) > 2 else '1deg'
  mode = sys.argv[3] if len(sys.argv) > 3 else 'sampler'

  from gencast_tpu import configs, utils
  spec = dataclasses.replace(configs.SPECS[spec_name], scan_unroll=unroll)
  print(f'[ab] scan_unroll={unroll} spec={spec_name} mode={mode}',
        file=sys.stderr)
  probe()

  if mode == 'sampler':
    fx = utils.sampler_fixture(
        spec, log=lambda m: print(f'[ab] {m}', file=sys.stderr))
    t0 = time.time()
    float(fx.sample(fx.state, fx.inputs, fx.forcings, fx.key))
    print(f'[ab] compile+first: {time.time()-t0:.1f}s', file=sys.stderr)
    ts = []
    for i in range(3):
      t0 = time.time()
      float(fx.sample(fx.state, fx.inputs + float(i + 1), fx.forcings,
                      fx.key))
      ts.append(time.time() - t0)
    print(f'RESULT scan_unroll={unroll} mode={mode} '
          f'min={min(ts):.3f}s all={[round(t, 3) for t in ts]}')
  else:
    import flax.nnx as nnx
    from gencast_tpu.models import casting
    from gencast_tpu.training import steps
    model, statics = configs.build_gencast(spec, rngs=nnx.Rngs(0))
    if spec.cast_bf16:
      model = casting.Bfloat16Cast(model)
    from gencast_tpu.models import wrappers
    opt = steps.create_optimizer(model, steps.OptimizerConfig())
    step_fn, state = steps.functional_train_step(model, opt)
    d = wrappers.find_layout_provider(model)
    nlat, nlon = statics.grid_lat.shape[0], statics.grid_lon.shape[0]

    def arr(c, i):
      return jax.random.normal(jax.random.PRNGKey(i), (1, nlat, nlon, c),
                               jnp.float32)

    inputs = arr(d.input_layout.num_channels, 0)
    targets = arr(d.target_layout.num_channels, 1)
    forcings = arr(d.forcing_layout.num_channels, 2)
    key = jax.random.PRNGKey(0)

    def reps(n):
      def run_factory():
        def body(carry, i):
          st, _, inp = carry
          st, loss, _ = step_fn(st, inp, targets, forcings,
                                jax.random.fold_in(key, i))
          return (st, loss, inp), None

        @jax.jit
        def run(st, inp):
          (st, loss, _), _ = jax.lax.scan(
              body, (st, jnp.float32(0), inp), jnp.arange(n))
          return loss
        return run

      run = run_factory()
      t0 = time.time()
      loss = float(run(state, inputs))
      print(f'[ab] reps={n}: first(compile) {time.time()-t0:.1f}s '
            f'loss={loss:.3f}', file=sys.stderr)
      ts = []
      for j in range(3):
        # Vary an input per call: identical repeated dispatches get
        # elided by the relay and time near zero (bench.py contract).
        t0 = time.time()
        float(run(state, inputs + float(j + 1)))
        ts.append(time.time() - t0)
      return min(ts)

    t1, t5 = reps(1), reps(5)
    per = (t5 - t1) / 4
    print(f'RESULT scan_unroll={unroll} mode=train per_step={per*1000:.1f}ms '
          f't1={t1:.3f}s t5={t5:.3f}s')


if __name__ == '__main__':
  main()
