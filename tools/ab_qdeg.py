"""A/B the 0.25-degree train step across ModelSpec variants on the real chip.

Usage: python tools/ab_qdeg.py save_attention
       python tools/ab_qdeg.py agg_plans
       python tools/ab_qdeg.py baseline
       python tools/ab_qdeg.py chunk64k|chunk192k|chunk256k|chunk512k

One variant per process (the relay serializes concurrent TPU jobs and a
fresh process isolates compile-cache effects). The step is seconds long,
so plain per-call timing is safe (far above relay dispatch noise); the
first call after the probe still pays the relay warm-up documented in
CLAUDE.md.
"""

import dataclasses
import sys
import time

import flax.nnx as nnx
import jax
import jax.numpy as jnp

from gencast_tpu import configs
from gencast_tpu.models import casting
from gencast_tpu.training import steps


def probe():
  t0 = time.time()
  x = jnp.ones((128, 128), jnp.float32)
  float(jnp.dot(x, x).sum())  # scalar readback: block_until_ready is a relay no-op
  print(f'[probe] relay up in {time.time()-t0:.1f}s', file=sys.stderr)


def main():
  variant = sys.argv[1] if len(sys.argv) > 1 else 'baseline'
  spec = configs.QUARTER_DEG
  if variant == 'save_attention':
    spec = dataclasses.replace(spec, remat_policy='save_attention')
  elif variant == 'agg_plans':
    spec = dataclasses.replace(spec, use_agg_plans=True)
  elif variant.startswith('chunk') and variant.endswith('k'):
    spec = dataclasses.replace(spec,
                               edge_chunk_size=int(variant[5:-1]) * 1024)
  elif variant != 'baseline':
    raise SystemExit(f'unknown variant {variant}')
  print(f'[ab] variant={variant}', file=sys.stderr)

  probe()
  t0 = time.time()
  model, statics = configs.build_gencast(spec, rngs=nnx.Rngs(0))
  model = casting.Bfloat16Cast(model)
  print(f'[ab] model build: {time.time()-t0:.1f}s', file=sys.stderr)
  opt = steps.create_optimizer(model, steps.OptimizerConfig())
  step_fn, state = steps.functional_train_step(model, opt)

  d = model.predictor.denoiser
  nlat, nlon = statics.grid_lat.shape[0], statics.grid_lon.shape[0]

  def arr(c, i):
    return jax.random.normal(jax.random.PRNGKey(i), (1, nlat, nlon, c),
                             jnp.float32)

  inputs = arr(d.input_layout.num_channels, 0)
  targets = arr(d.target_layout.num_channels, 1)
  forcings = arr(d.forcing_layout.num_channels, 2)
  jax.block_until_ready(forcings)
  key = jax.random.PRNGKey(0)

  t0 = time.time()
  state, loss, _ = step_fn(state, inputs, targets, forcings, key)
  loss_val = float(loss)  # scalar readback bounds the relay dispatch
  print(f'[ab] compile+run: {time.time()-t0:.1f}s loss={loss_val:.3f}',
        file=sys.stderr)
  try:
    ms = jax.local_devices()[0].memory_stats()
    print(f"[ab] peak_bytes_in_use={ms.get('peak_bytes_in_use', 0)/2**30:.2f}"
          'GiB', file=sys.stderr)
  except Exception as e:  # memory_stats unsupported on some backends
    print(f'[ab] memory_stats unavailable: {e}', file=sys.stderr)

  ts = []
  for i in range(4):
    t0 = time.time()
    state, loss, _ = step_fn(state, inputs, targets, forcings,
                             jax.random.fold_in(key, i + 1))
    float(loss)  # scalar readback: block_until_ready is a relay no-op
    ts.append(time.time() - t0)
    print(f'[ab] step {i}: {ts[-1]:.3f}s', file=sys.stderr)
  print(f'RESULT variant={variant} min={min(ts):.3f}s all={ts}')


if __name__ == '__main__':
  main()
