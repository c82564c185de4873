"""Sweep block-sparse attention tile size at the 0.25-degree mask.

Isolated differenced-kernel benchmark (bench.py methodology): per tile
size, time the attention kernel fwd and fwd+bwd chained through an
on-device lax.scan, differenced 1-rep vs N-rep. bf16 operands, the
QUARTER_DEG head geometry (H=4, d=128).

Run on the real chip:  python tools/sweep_attention_tiles.py [tiles]
(defaults to the QUARTER_DEG mask; the 1-degree numbers in configs.py came
from the same harness pointed at ONE_DEG).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gencast_tpu import configs
from gencast_tpu.graph import compiler
from gencast_tpu.ops import sparse_attention as sa

REPS = 9
TILES = [int(t) for t in (sys.argv[1].split(',') if len(sys.argv) > 1
                          else ['512', '768', '1024'])]

spec = configs.QUARTER_DEG
statics = configs.build_statics(spec)
n = statics.num_mesh_nodes
h, d = spec.num_heads, spec.d_model // spec.num_heads
print(f'[sweep] mesh nodes={n} heads={h} head_dim={d}', file=sys.stderr)

t0 = time.time()
csr = compiler.khop_mask_csr(statics.mesh_edges.senders,
                             statics.mesh_edges.receivers,
                             n, spec.attention_k_hop)
print(f'[sweep] khop csr: {time.time()-t0:.1f}s nnz={csr.nnz}',
      file=sys.stderr)


def probe():
  t_all = time.time()
  for i in range(4):
    t0 = time.time()
    x = jax.random.normal(jax.random.PRNGKey(i), (256, 256))
    float((x @ x).sum())
    if time.time() - t0 < 1.0 or time.time() - t_all > 150:
      break
  print(f'[sweep] relay warm in {time.time()-t_all:.1f}s', file=sys.stderr)


def timed(fn, make_args, iters=2):
  float(fn(*make_args(-1)))
  ts = []
  for i in range(iters):
    a = make_args(i)
    t0 = time.time()
    float(fn(*a))
    ts.append(time.time() - t0)
  return min(ts)


probe()
key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q0 = jax.random.normal(kq, (1, n, h, d), jnp.bfloat16)
k0 = jax.random.normal(kk, (1, n, h, d), jnp.bfloat16)
v0 = jax.random.normal(kv, (1, n, h, d), jnp.bfloat16)

for tile in TILES:
  t0 = time.time()
  plan = sa.build_tile_plan(csr, tile=tile)
  meta = (plan.tile, plan.num_active_fwd, plan.num_active_bwd)
  hpb = sa._heads_per_block(h, tile, d)
  mt = jnp.asarray(plan.mask_tiles)
  fids = jnp.asarray(plan.fwd_kv_ids)
  fpids = jnp.asarray(plan.fwd_pair_ids)
  bwd = (jnp.asarray(plan.bwd_q_ids), jnp.asarray(plan.bwd_pair_ids))
  ntiles = plan.mask_tiles.shape[0] - 1
  density = ntiles / (plan.num_q_tiles ** 2)
  print(f'[tile {tile}] plan: {time.time()-t0:.1f}s  q_tiles='
        f'{plan.num_q_tiles} A_fwd={plan.num_active_fwd} '
        f'A_bwd={plan.num_active_bwd} pairs={ntiles} hpb={hpb} '
        f'mask_mb={plan.mask_tiles.nbytes/2**20:.0f}', file=sys.stderr)

  # Plan arrays MUST be jit ARGUMENTS: closed-over device arrays are baked
  # into the HLO as constants and the relay rejects >~100MB compile
  # payloads (HTTP 413 — the 0.25-degree mask tiles are 378MB).
  def att(qq, plan_arrays):
    k_, v_, mt_, fids_, fpids_, bq_, bp_ = plan_arrays
    return sa.sparse_banded_attention(qq, k_, v_, mt_, fids_, fpids_,
                                      (bq_, bp_), meta)

  plan_args = (k0, v0, mt, fids, fpids, bwd[0], bwd[1])

  def fwd_loop(reps):
    @jax.jit
    def loop(x, plan_arrays):
      def body(c, _):
        return att(c, plan_arrays).astype(jnp.bfloat16), ()
      c, _ = jax.lax.scan(body, x, None, length=reps)
      return c.astype(jnp.float32).sum()
    return loop

  def bwd_loop(reps):
    @jax.jit
    def loop(x, plan_arrays):
      def body(c, _):
        g = jax.grad(
            lambda qq: att(qq, plan_arrays).astype(jnp.float32).sum())(c)
        return g.astype(jnp.bfloat16), ()
      c, _ = jax.lax.scan(body, x, None, length=reps)
      return c.astype(jnp.float32).sum()
    return loop

  probe()
  t1 = timed(fwd_loop(1), lambda i: (q0 + float(i), plan_args))
  tn = timed(fwd_loop(REPS), lambda i: (q0 + float(i), plan_args))
  fwd_ms = (tn - t1) / (REPS - 1) * 1000
  t1 = timed(bwd_loop(1), lambda i: (q0 + float(i), plan_args))
  tn = timed(bwd_loop(REPS), lambda i: (q0 + float(i), plan_args))
  bwd_ms = (tn - t1) / (REPS - 1) * 1000
  print(f'[tile {tile}] fwd {fwd_ms:.2f} ms/layer   fwd+bwd {bwd_ms:.2f} '
        f'ms/layer', flush=True)
