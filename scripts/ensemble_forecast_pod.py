#!/usr/bin/env python
"""Pod-scale ensemble forecast: 50 members x 30 steps over a TPU slice.

Run with one process per TPU host (multi-host jax.distributed); members
shard over the 'ensemble' mesh axis. On a v5e-64 this executes the
BASELINE.md north-star workload.

  python scripts/ensemble_forecast_pod.py --preset 1deg \
      --ckpt_dir /ckpt/1deg --data /data/era5 --members 50 --steps 30
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--preset', default='1deg')
  p.add_argument('--data', default='synthetic')
  p.add_argument('--ckpt_dir', default=None)
  p.add_argument('--members', type=int, default=50)
  p.add_argument('--steps', type=int, default=30)
  p.add_argument('--out', default='/tmp/forecast.npz')
  p.add_argument('--multihost', action='store_true',
                 help='initialize jax.distributed (one process per host)')
  args = p.parse_args()

  import jax
  if args.multihost:
    jax.distributed.initialize()

  import flax.nnx as nnx
  import jax.numpy as jnp
  import numpy as np

  from gencast_tpu import configs
  from gencast_tpu.data import sources
  from gencast_tpu.models import wrappers
  from gencast_tpu.parallel import ensemble, meshes
  from gencast_tpu.training import checkpoint as ckpt_lib
  from gencast_tpu.training.train import build_spec

  n_dev = len(jax.devices())
  ens_axis = min(args.members, n_dev)
  mesh = meshes.make_mesh(ensemble=ens_axis, data=1,
                          model=n_dev // ens_axis)
  print(f'[forecast] {n_dev} devices, mesh ensemble={ens_axis} '
        f'model={n_dev // ens_axis}')

  class _A:  # build_spec expects argparse-like fields
    preset = args.preset
    mesh_size = d_model = num_layers = num_heads = None
    attention_k_hop = attention_type = None
  spec = build_spec(_A)
  model, statics = configs.build_gencast(spec, rngs=nnx.Rngs(0))

  task = model.task
  source = (sources.SyntheticSource(task, statics.grid_lat, statics.grid_lon,
                                    num_times=args.steps + 4)
            if args.data == 'synthetic'
            else sources.Era5NpzSource(args.data, task))
  stats = sources.compute_stats(source)
  wrapped = wrappers.InputsAndResiduals(model, stats)
  if args.ckpt_dir:
    manager = ckpt_lib.create_manager(args.ckpt_dir)
    step = ckpt_lib.restore(manager, wrapped)
    print(f'[forecast] restored step {step}')

  meshes.shard_model(wrapped, mesh)
  w = source.sample(0, num_target_frames=args.steps)
  inputs = jnp.asarray(w.inputs)[None]
  forcings = jnp.asarray(w.forcings)[:, None]

  t0 = time.time()
  out = ensemble.ensemble_rollout(wrapped, inputs, forcings,
                                  jax.random.PRNGKey(0),
                                  num_members=args.members, mesh=mesh)
  out.block_until_ready()
  dt = time.time() - t0
  print(f'[forecast] {args.members} members x {args.steps} steps: '
        f'{dt:.1f}s wall (incl. compile)')

  if jax.process_index() == 0:
    np.savez(args.out, predictions=np.asarray(out),
             lat=statics.grid_lat, lon=statics.grid_lon)
    print(f'[forecast] saved to {args.out}')


if __name__ == '__main__':
  main()
