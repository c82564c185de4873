"""A/B: 1-degree per-step training throughput with a host-side NetCDF
source, prefetch on vs off, vs the synthetic device-resident baseline.

The round-3 verdict asked for evidence that real-data per-step training
does not stall the chip on host packing (the reference hands this to
Grain, training/era5_dataset.py:797-842). This drives ONE_DEG training
through Era5NetCDFSource on a synthesized 1-degree corpus
(tools/synth_era5.py) and times the steady-state step wall three ways:

  A) --prefetch 2 (data/prefetch.py double buffering, the default)
  B) --prefetch 0 (synchronous pack + put in the step loop)
  C) device-resident batch (same arrays every step; the fused
     device-pool mode's per-step bound, no host work at all)

Run on the real chip:  python -m tools.ab_prefetch_onedeg
(generates the corpus under /tmp on first use; ~10 min wall total).

Measured 2026-08-19 (this relay-attached 1-core host): device-resident
23 ms/step wall (relay pipelining, not device time), sync host source
1318 ms/step, prefetch-ON 1504 ms/step — per-step training here is
bound by the ~1.2 s/call relay dispatch overhead, and the prefetch
thread only adds single-core contention. The prefetcher targets real
TPU-VM hosts (many cores, ~ms dispatch) where host packing would
otherwise stall the chip; on this host use the fused --steps_per_call
device-pool mode for throughput.
"""

from __future__ import annotations

import argparse
import glob
import os
import time


def _ensure_corpus(root: str, steps: int) -> str:
  if not glob.glob(os.path.join(root, 'era5_pressure_levels_*_1.00deg.nc')):
    from tools import synth_era5
    t0 = time.time()
    synth_era5.synthesize(root, resolution_deg=1.0, months=['202001'],
                          steps_per_month=steps, seed=0)
    print(f'[ab] corpus synthesized in {time.time()-t0:.0f}s')
  return root


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument('--corpus', default='/tmp/era5_synth_1deg')
  p.add_argument('--corpus_steps', type=int, default=18)
  p.add_argument('--steps', type=int, default=8,
                 help='timed steps per mode (after 2 warmup steps)')
  args = p.parse_args(argv)

  import flax.nnx as nnx
  import jax
  import jax.numpy as jnp
  import numpy as np

  from gencast_tpu import configs
  from gencast_tpu.data import era5_netcdf, prefetch as prefetch_lib, sources
  from gencast_tpu.models import casting, wrappers
  from gencast_tpu.training import steps as steps_lib

  _ensure_corpus(args.corpus, args.corpus_steps)

  t0 = time.time()
  spec = configs.ONE_DEG
  model, statics = configs.build_gencast(spec, rngs=nnx.Rngs(0))
  wrapped = casting.Bfloat16Cast(model)
  source = era5_netcdf.Era5NetCDFSource(args.corpus, spec.task,
                                        resolution_deg=1.0)
  stats = sources.compute_stats(source, max_samples=8)
  wrapped = wrappers.NaNCleaner(wrapped, 'sea_surface_temperature', 0.0)
  wrapped = wrappers.InputsAndResiduals(wrapped, stats)
  optimizer = steps_lib.create_optimizer(wrapped, steps_lib.OptimizerConfig())
  print(f'[ab] model+source built in {time.time()-t0:.0f}s')

  key = jax.random.PRNGKey(0)

  def put(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}

  def run_mode(tag, batch_fn, n):
    # Warmup (compile + first relay dispatches). NOTE: only a host scalar
    # readback (float()) bounds wall time through the relay —
    # block_until_ready acks before the dispatch completes (dev notes).
    for i in range(2):
      b = batch_fn()
      loss, _ = steps_lib.train_step(wrapped, optimizer, b['inputs'],
                                     b['targets'], b['forcings'],
                                     jax.random.fold_in(key, i))
    float(loss)
    t0 = time.time()
    for i in range(n):
      b = batch_fn()
      loss, _ = steps_lib.train_step(wrapped, optimizer, b['inputs'],
                                     b['targets'], b['forcings'],
                                     jax.random.fold_in(key, 100 + i))
    loss_val = float(loss)
    dt = (time.time() - t0) / n
    print(f'[ab] {tag}: {dt*1000:.0f} ms/step wall '
          f'({1.0/dt:.2f} steps/s), loss={loss_val:.3f}')
    return dt

  # C) device-resident baseline: host does nothing per step.
  b0 = put(next(sources.batch_iterator(source, 1, shuffle=False)))
  dt_dev = run_mode('device-resident batch', lambda: b0, args.steps)

  # B) synchronous host pack + put every step.
  it_sync = sources.batch_iterator(source, 1, seed=1)
  dt_sync = run_mode('per-step host source, prefetch OFF',
                     lambda: put(next(it_sync)), args.steps)

  # A) background prefetch.
  pf = prefetch_lib.DevicePrefetcher(
      sources.batch_iterator(source, 1, seed=2), transform=put,
      buffer_size=2)
  dt_pf = run_mode('per-step host source, prefetch ON (buffer 2)',
                   lambda: next(pf), args.steps)
  pf.close()

  print(f'[ab] summary: device {dt_dev*1000:.0f} ms | '
        f'sync {dt_sync*1000:.0f} ms (+{(dt_sync/dt_dev-1)*100:.0f}%) | '
        f'prefetch {dt_pf*1000:.0f} ms (+{(dt_pf/dt_dev-1)*100:.0f}%)')


if __name__ == '__main__':
  main()
