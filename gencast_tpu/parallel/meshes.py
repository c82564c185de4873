"""Device mesh construction and model/data sharding.

The framework uses one logical mesh with three axes:

* 'ensemble' — independent diffusion samples (GenCast's signature axis;
  replaces the reference's jax.pmap ensemble path, common/rollout.py:78-202)
* 'data'     — batch data parallelism
* 'model'    — tensor parallelism over MLP hidden / attention head dims,
  activating the P(None, 'model') annotations carried by every kernel.

Gradient reduction across 'data'/'ensemble' is implicit: jit over the mesh
inserts the collectives (psum over ICI) from the sharding specs — no
hand-written NCCL/pmean as in torch-style frameworks.
"""

from __future__ import annotations


import flax.nnx as nnx
import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ('ensemble', 'data', 'model')


def make_mesh(ensemble: int = 1, data: int = 1, model: int = 1,
              devices=None) -> Mesh:
  """Mesh over (ensemble, data, model); total must equal device count."""
  if devices is None:
    devices = jax.devices()
  n = ensemble * data * model
  if n != len(devices):
    raise ValueError(f'mesh {ensemble}x{data}x{model}={n} != '
                     f'{len(devices)} devices')
  dev_array = mesh_utils.create_device_mesh((ensemble, data, model),
                                            devices=devices)
  return Mesh(dev_array, AXES)


def shard_model(model: nnx.Module, mesh: Mesh) -> None:
  """Places model state on the mesh according to its partitioning metadata.

  Parameters annotated P(None, 'model') shard over the model axis; all
  other state (and parameters without annotations) replicates.
  """
  state = nnx.state(model)
  pspecs = nnx.get_partition_spec(state)

  def sanitize(x, spec) -> P:
    """Drop axis assignments whose size doesn't divide the dim (e.g. a
    3-channel decoder bias annotated P('model')) — replicate instead."""
    if not isinstance(spec, P):
      return P()
    dims = []
    for i, axis in enumerate(spec):
      if axis is None or i >= x.ndim:
        dims.append(None)
        continue
      names = axis if isinstance(axis, tuple) else (axis,)
      size = int(np.prod([mesh.shape[n] for n in names]))
      dims.append(axis if x.shape[i] % size == 0 else None)
    return P(*dims)

  def place(x, spec):
    if not isinstance(x, (jax.Array, np.ndarray)):
      return x
    return jax.device_put(x, NamedSharding(mesh, sanitize(x, spec)))

  sharded = jax.tree.map(place, state, pspecs)
  nnx.update(model, sharded)


def batch_sharding(mesh: Mesh) -> NamedSharding:
  """[B, lat, lon, C] data tensors: batch over the 'data' axis."""
  return NamedSharding(mesh, P('data'))


def ensemble_batch_sharding(mesh: Mesh) -> NamedSharding:
  """[members, B, lat, lon, C]: members over 'ensemble', batch over 'data'."""
  return NamedSharding(mesh, P('ensemble', 'data'))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())
