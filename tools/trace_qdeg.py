"""Profile one 0.25-degree train step and print the device-time breakdown.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/trace_qdeg.py [outdir]

Builds the QUARTER_DEG model, compiles + warms the donated-state train
step, wraps ONE step in jax.profiler.trace, then parses the perfetto
trace.json.gz for TPU-track op durations grouped by fusion name.
"""

import collections
import glob
import gzip
import json
import sys
import time

import flax.nnx as nnx
import jax
import jax.numpy as jnp


def run(outdir: str, spec_name: str = '0.25deg'):
  from gencast_tpu import configs
  from gencast_tpu.models import casting
  from gencast_tpu.training import steps

  x = jnp.ones((128, 128), jnp.float32)
  jax.block_until_ready(jnp.dot(x, x))

  spec = configs.SPECS[spec_name]
  t0 = time.time()
  model, statics = configs.build_gencast(spec, rngs=nnx.Rngs(0))
  if spec.cast_bf16:
    model = casting.Bfloat16Cast(model)
  print(f'[trace] model build: {time.time()-t0:.1f}s', file=sys.stderr)
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
  key = jax.random.PRNGKey(0)

  t0 = time.time()
  state, loss, _ = step_fn(state, inputs, targets, forcings, key)
  jax.block_until_ready(loss)
  print(f'[trace] compile+warm: {time.time()-t0:.1f}s', file=sys.stderr)
  state, loss, _ = step_fn(state, inputs, targets, forcings,
                           jax.random.fold_in(key, 1))
  jax.block_until_ready(loss)

  jax.profiler.start_trace(outdir)
  t0 = time.time()
  state, loss, _ = step_fn(state, inputs, targets, forcings,
                           jax.random.fold_in(key, 2))
  jax.block_until_ready(loss)
  wall = time.time() - t0
  jax.profiler.stop_trace()
  print(f'[trace] profiled step wall: {wall:.3f}s', file=sys.stderr)


def parse(outdir: str, top: int = 45):
  paths = sorted(glob.glob(f'{outdir}/plugins/profile/*/*.trace.json.gz'))
  if not paths:
    raise SystemExit(f'no trace under {outdir}')
  with gzip.open(paths[-1], 'rt') as f:
    data = json.load(f)
  events = data['traceEvents']

  # TPU device tracks: pid names like '/device:TPU:0' (XLA op tracks).
  pid_name = {}
  tid_name = {}
  for ev in events:
    if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
      pid_name[ev['pid']] = ev['args'].get('name', '')
    if ev.get('ph') == 'M' and ev.get('name') == 'thread_name':
      tid_name[(ev['pid'], ev['tid'])] = ev['args'].get('name', '')

  device_pids = {p for p, n in pid_name.items()
                 if 'TPU' in n or 'device' in n.lower()}
  agg = collections.Counter()
  total = 0.0
  for ev in events:
    if ev.get('ph') != 'X' or ev.get('pid') not in device_pids:
      continue
    tname = tid_name.get((ev['pid'], ev['tid']), '')
    # XLA Ops track carries per-op durations; skip step/launch meta tracks.
    if 'XLA Op' not in tname and 'Ops' not in tname:
      continue
    dur = ev.get('dur', 0) / 1e3  # us -> ms
    name = ev.get('name', '?')
    agg[name] += dur
    total += dur
  if not agg:
    # Fall back: dump the track names so the caller can adjust.
    for k, v in sorted(set(tid_name.items())):
      print(k, v)
    raise SystemExit('no ops matched; tracks above')

  print(f'total device op time: {total:.1f} ms over {len(agg)} distinct ops')
  for name, ms in agg.most_common(top):
    print(f'{ms:9.2f} ms  {name[:140]}')


if __name__ == '__main__':
  out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/qdeg_trace'
  run(out)
  parse(out)
