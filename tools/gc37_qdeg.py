"""One-off: GraphCast at the PUBLISHED model's exact operating point.

The published GraphCast (reference: graphcast/graphcast.py:174-201 +
its TaskConfig) is 0.25 degrees, 37 ERA5 pressure levels, latent 512,
16 unshared multimesh MP steps. bench.py's graphcast_qdeg section runs
the 13-level task (the preset conversion); this script swaps in
registry.GRAPHCAST_TASK_37 — ~2.6x the input/output channels, same
latent core — to prove the full published configuration builds, fits,
and trains on one 16GB v5e chip under the same memory plan (bf16 +
donated state + streamed encoder/decoder edges + whole-GNN
encoder/decoder remat + per-MP-step processor remat) PLUS hierarchical
grouping of the per-step checkpoints (remat_group=4): flat per-step
remat keeps all 16 loop-carried node+edge step boundaries live
(~480 MB each) and OOMs by 2.17 GB at 37 levels; sqrt-grouping keeps
4 group boundaries + 4 step boundaries.

Usage: python tools/gc37_qdeg.py   (run from the repo root; one TPU job
at a time; expect a relay first-probe stall of up to ~8 min).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.nnx as nnx
import jax
import jax.numpy as jnp

from gencast_tpu import configs
from gencast_tpu.data import registry
from gencast_tpu.models import casting
from gencast_tpu.training import steps


def main():
  t0 = time.time()
  float(jnp.ones(()) + 1)  # relay probe: absorb the first-call stall
  print(f'[gc37] probe: {time.time()-t0:.1f}s', file=sys.stderr)

  spec = dataclasses.replace(configs.QUARTER_DEG,
                             task=registry.GRAPHCAST_TASK_37)
  t0 = time.time()
  model, statics = configs.build_graphcast(spec, rngs=nnx.Rngs(0),
                                           remat_group=4)
  model = casting.Bfloat16Cast(model)
  print(f'[gc37] model build: {time.time()-t0:.1f}s', file=sys.stderr)

  opt = steps.create_optimizer(model, steps.OptimizerConfig())
  step_fn, state = steps.functional_train_step(model, opt)

  d = model.predictor
  nlat, nlon = statics.grid_lat.shape[0], statics.grid_lon.shape[0]
  print(f'[gc37] channels: in={d.input_layout.num_channels} '
        f'tgt={d.target_layout.num_channels} '
        f'frc={d.forcing_layout.num_channels}', file=sys.stderr)

  def arr(c, i):
    return jax.random.normal(jax.random.PRNGKey(i), (1, nlat, nlon, c),
                             jnp.float32)

  inputs = arr(d.input_layout.num_channels, 0)
  targets = arr(d.target_layout.num_channels, 1)
  forcings = arr(d.forcing_layout.num_channels, 2)
  key = jax.random.PRNGKey(0)

  t0 = time.time()
  state, loss, _ = step_fn(state, inputs, targets, forcings, key)
  print(f'[gc37] compile+run: {time.time()-t0:.1f}s '
        f'loss={float(loss):.3f}', file=sys.stderr)
  ts = []
  for i in range(3):
    t0 = time.time()
    state, loss, _ = step_fn(state, inputs, targets, forcings,
                             jax.random.fold_in(key, i + 1))
    float(loss)  # scalar readback bounds the wall
    ts.append(time.time() - t0)
  print(json.dumps({'metric': 'graphcast37_qdeg_train_step_sec',
                    'value': round(min(ts), 3), 'unit': 's/step',
                    'all': [round(t, 3) for t in ts]}))


if __name__ == '__main__':
  main()
