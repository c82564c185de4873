"""Benchmarks: the north-star metric set on the real chip.

Prints one JSON line per metric: {"metric", "value", "unit", "vs_baseline"}
— headline (nano denoiser fwd steps/s) first. The reference publishes no
quantitative numbers (README.md:19, BASELINE.md), so vs_baseline is null.

Metrics:
  nano_denoiser_steps_per_sec  — chained denoiser forwards (headline)
  nano_train_step_ms           — fwd+bwd+AdamW, nano
  nano_sampler_sec             — 20-level DPM++2S (39 denoiser calls)
  onedeg_train_step_ms         — fwd+bwd+AdamW, 1-degree splits=5 d=512
  onedeg_sampler_sec           — 20-level DPM++2S at 1 degree
  quarterdeg_train_step_sec    — fwd+bwd+AdamW at 0.25 degrees (bf16,
                                 donated state; dispatch-path timing)

Methodology: everything except the samplers is chained through an
on-device lax.scan (output feeds the next call's input) and differenced
between a 1-rep and an N-rep program with a scalar host readback. This is
required on this hardware setup: per-call dispatch timings through the
remote TPU relay are unreliable (repeated identical dispatches get
elided). The samplers are already 39-call on-device loops, timed wall-
clock post-warmup. Set BENCH_SKIP_1DEG=1 to emit only the nano metrics.
"""

import json
import os
import sys
import time

import numpy as np

REPS = 21


def _emit(metric, value, unit):
  print(json.dumps({'metric': metric, 'value': round(value, 3),
                    'unit': unit, 'vs_baseline': None}))
  sys.stdout.flush()


def _timed(fn, make_args, iters=3):
  """Min wall time of fn(*make_args(i)) with a scalar readback, post-warmup.

  make_args must vary per i: identical repeated dispatches through the
  relay get elided and time near zero.
  """
  float(fn(*make_args(-1)))
  times = []
  for i in range(iters):
    args = make_args(i)
    t0 = time.time()
    float(fn(*args))
    times.append(time.time() - t0)
  return min(times)


def bench_model(spec, tag, train_reps, fwd=False):
  import flax.nnx as nnx
  import jax
  import jax.numpy as jnp

  from gencast_tpu import configs
  from gencast_tpu.training import steps

  t0 = time.time()
  model, statics = configs.build_gencast(spec, rngs=nnx.Rngs(0))
  print(f'[{tag}] model build: {time.time()-t0:.1f}s', file=sys.stderr)
  d = model.denoiser
  nlat, nlon = statics.grid_lat.shape[0], statics.grid_lon.shape[0]
  rng = np.random.default_rng(0)

  def arr(c):
    return jnp.asarray(rng.standard_normal((1, nlat, nlon, c)), jnp.float32)

  inputs = arr(d.input_layout.num_channels)
  targets = arr(d.target_layout.num_channels)
  forcings = arr(d.forcing_layout.num_channels)
  key = jax.random.PRNGKey(0)

  # --- denoiser forward (chained) ---
  if fwd:
    graphdef, state = nnx.split(model)
    m = nnx.merge(graphdef, state)
    sigma = jnp.ones((1,), jnp.float32)

    def loop_factory(reps):
      @jax.jit
      def loop(x):
        def body(c, _):
          return m(inputs, c, sigma, forcings), ()
        c, _ = jax.lax.scan(body, x, None, length=reps)
        return c.sum()
      return loop

    t1 = _timed(loop_factory(1), lambda i: (targets + float(i),))
    tn = _timed(loop_factory(REPS), lambda i: (targets + float(i),))
    dt = (tn - t1) / (REPS - 1)
    print(f'[{tag}] denoiser fwd: {dt*1000:.2f} ms/step', file=sys.stderr)
    _emit(f'{tag}_denoiser_steps_per_sec', 1.0 / dt, 'steps/s/chip')

  # --- train step (fwd+bwd+AdamW, chained through optimizer state) ---
  opt = steps.create_optimizer(model, steps.OptimizerConfig())
  graphdef, state = nnx.split((model, opt))

  def train_loop_factory(reps):
    @jax.jit
    def loop(state, inputs):
      def body(carry, _):
        mm, oo = nnx.merge(graphdef, carry)

        def loss_fn(m_):
          loss, _ = m_.loss(inputs, targets, forcings, key)
          return loss.mean()

        loss, grads = nnx.value_and_grad(loss_fn)(mm)
        oo.update(mm, grads)
        _, new_state = nnx.split((mm, oo))
        return new_state, loss
      _, losses = jax.lax.scan(body, state, None, length=reps)
      return losses.sum()
    return loop

  t1 = _timed(train_loop_factory(1), lambda i: (state, inputs + float(i)))
  tn = _timed(train_loop_factory(train_reps),
              lambda i: (state, inputs + float(i)))
  dt = (tn - t1) / (train_reps - 1)
  print(f'[{tag}] train step: {dt*1000:.1f} ms', file=sys.stderr)
  _emit(f'{tag}_train_step_ms', dt * 1000, 'ms/step')

  # --- full sampler (one forecast step: 39 denoiser calls on-device) ---
  graphdef_m, state_m = nnx.split(model)

  @jax.jit
  def sample(state, inputs, forcings, k):
    mm = nnx.merge(graphdef_m, state)
    return mm.sample(inputs, forcings, k).sum()

  t = _timed(sample, lambda i: (state_m, inputs + float(i), forcings, key),
             iters=2)
  print(f'[{tag}] sampler: {t:.2f}s/forecast-step', file=sys.stderr)
  _emit(f'{tag}_sampler_sec', t, 's/forecast-step')


def bench_quarterdeg():
  """0.25-degree train step: bf16 + donated state (no scan chaining —
  the step itself is seconds long, far above relay dispatch noise)."""
  import flax.nnx as nnx
  import jax
  import jax.numpy as jnp

  from gencast_tpu import configs
  from gencast_tpu.models import casting
  from gencast_tpu.training import steps

  t0 = time.time()
  model, statics = configs.build_gencast(configs.QUARTER_DEG,
                                         rngs=nnx.Rngs(0))
  model = casting.Bfloat16Cast(model)
  print(f'[qdeg] model build: {time.time()-t0:.1f}s', file=sys.stderr)
  opt = steps.create_optimizer(model, steps.OptimizerConfig())
  step_fn, state = steps.functional_train_step(model, opt)

  d = model.predictor.denoiser
  nlat, nlon = statics.grid_lat.shape[0], statics.grid_lon.shape[0]
  rng = np.random.default_rng(0)

  def arr(c):
    return jnp.asarray(rng.standard_normal((1, nlat, nlon, c)),
                       jnp.float32)

  inputs = arr(d.input_layout.num_channels)
  targets = arr(d.target_layout.num_channels)
  forcings = arr(d.forcing_layout.num_channels)
  key = jax.random.PRNGKey(0)

  t0 = time.time()
  state, loss, _ = step_fn(state, inputs, targets, forcings, key)
  print(f'[qdeg] compile+run: {time.time()-t0:.1f}s '
        f'loss={float(loss):.3f}', file=sys.stderr)
  ts = []
  for i in range(3):
    t0 = time.time()
    state, loss, _ = step_fn(state, inputs, targets, forcings,
                             jax.random.fold_in(key, i + 1))
    jax.block_until_ready(loss)
    ts.append(time.time() - t0)
  _emit('quarterdeg_train_step_sec', min(ts), 's/step')


def main():
  from gencast_tpu import configs

  bench_model(configs.NANO, 'nano', train_reps=REPS, fwd=True)
  if not os.environ.get('BENCH_SKIP_1DEG'):
    bench_model(configs.ONE_DEG, 'onedeg', train_reps=9)
  if not os.environ.get('BENCH_SKIP_QDEG'):
    bench_quarterdeg()


if __name__ == '__main__':
  main()
