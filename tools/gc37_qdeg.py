"""One-command repro: GraphCast at the PUBLISHED model's exact operating
point — 0.25 degrees, 37 ERA5 pressure levels, latent 512, 16 unshared
multimesh MP steps (reference: graphcast/graphcast.py:174-201 + its
TaskConfig).

bench.py's graphcast_qdeg section runs the 13-level task (the preset
conversion); this drives its graphcast_qdeg37 section, which swaps in
registry.GRAPHCAST_TASK_37 — ~2.6x the input/output channels, same latent
core — to prove the full published configuration builds, fits, and trains
on one 16GB v5e chip under the same memory plan (bf16 + donated state +
streamed encoder/decoder edges + whole-GNN encoder/decoder remat)
PLUS hierarchical grouping of the per-MP-step checkpoints (remat_group=4):
flat per-step remat keeps all 16 loop-carried node+edge step boundaries
live (~480 MB each) and OOMs by 2.17 GB at 37 levels; sqrt-grouping keeps
4 group boundaries + 4 step boundaries.

Usage: python tools/gc37_qdeg.py   (run from the repo root; one TPU job
at a time; expect a relay first-probe stall of up to ~8 min).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


if __name__ == '__main__':
  bench.bench_graphcast_qdeg37()
