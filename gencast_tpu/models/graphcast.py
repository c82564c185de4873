"""GraphCast: deterministic encode-process-decode forecasting.

Packed-array rebuild of the reference's GraphCast (graphcast/graphcast.py),
which is unrunnable there (Haiku-era constructor calls, README.md:5); this
revival shares the whole GNN stack with GenCast. Differences from GenCast's
denoiser: the processor is a deep multimesh GNN (gnn_msg_steps unshared
InteractionNetwork steps over the union of edges across all refinement
levels) instead of a transformer, and there is no noise conditioning.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.nnx as nnx
import jax
import jax.numpy as jnp

from gencast_tpu.data import layout as layout_lib
from gencast_tpu.data.registry import TaskSpec
from gencast_tpu.graph.compiler import GraphStatics
from gencast_tpu.nn.gnn import EdgeTopology, TypedGraphNet
from gencast_tpu.nn.variables import StaticData
from gencast_tpu.ops import losses


@dataclasses.dataclass(frozen=True)
class GraphCastConfig:
  """Reference ModelConfig (graphcast/graphcast.py:174-201)."""
  latent_size: int = 512
  gnn_msg_steps: int = 16
  hidden_layers: int = 1
  radius_query_fraction_edge_length: float = 0.6
  mesh2grid_edge_normalization_factor: Optional[float] = None
  # Streamed edge processing for the 1-step encoder/decoder GNNs (see
  # nn/gnn.py); required at paper scale on a single chip.
  edge_chunk_size: Optional[int] = None
  # Scatter-free GNN aggregation on skewed edge sets (see
  # DenoiserConfig.use_agg_plans / ops/segment.py).
  use_agg_plans: bool = False
  agg_plan_min_degree: int = 32
  # Gradient checkpointing for paper scale on one chip: jax.checkpoint
  # around the grid2mesh encoder, EACH of the gnn_msg_steps processor
  # steps (the 16 unshared multimesh MP steps carry ~1.5 GB bf16 of MLP
  # residuals each at 0.25 degrees), and the mesh2grid decoder. The
  # backward keeps only step-boundary latents and recomputes MLP
  # internals, the same trade DenoiserConfig.remat_gnns makes for the
  # GenCast encoder/decoder.
  remat: bool = False
  # With remat on, group the processor steps into remat_group-sized
  # nested-checkpoint blocks (sqrt-style hierarchical remat). 1 = flat
  # per-step remat. 4 fits the 37-level published configuration at 0.25
  # degrees on a 16GB chip, where flat remat's 16 live step boundaries
  # (~480 MB node+edge latents each) exceed HBM by ~2.2 GB.
  remat_group: int = 1


# Reference loss weights (graphcast/graphcast.py:404-416).
LOSS_WEIGHTS_SURFACE = {
    '2m_temperature': 1.0,
    '10m_u_component_of_wind': 0.1,
    '10m_v_component_of_wind': 0.1,
    'mean_sea_level_pressure': 0.1,
    'total_precipitation_6hr': 0.1,
}


class GraphCast(nnx.Module):
  """Deterministic predictor over packed [B, lat, lon, C] tensors."""

  @staticmethod
  def _plan(topo: EdgeTopology, num_senders: int, num_receivers: int,
            cfg: GraphCastConfig) -> EdgeTopology:
    if not cfg.use_agg_plans:
      return topo
    return topo.with_agg_plans(num_senders, num_receivers,
                               min_max_degree=cfg.agg_plan_min_degree)

  def __init__(self, task: TaskSpec, statics: GraphStatics,
               config: GraphCastConfig = GraphCastConfig(), *,
               rngs: nnx.Rngs):
    if statics.multimesh_edges is None:
      raise ValueError('GraphCast requires GraphStatics built with '
                       'build_multimesh=True')
    self.task = task
    cfg = config
    self._remat = cfg.remat
    latent = cfg.latent_size
    self.num_lat = statics.grid_lat.shape[0]
    self.num_lon = statics.grid_lon.shape[0]

    self.input_layout = layout_lib.build_layout(
        task.input_variables, task.pressure_levels, task.num_input_frames)
    self.target_layout = layout_lib.build_layout(
        task.target_variables, task.pressure_levels, 1)
    self.forcing_layout = layout_lib.build_layout(
        task.forcing_variables, task.pressure_levels, 1)

    self.grid_struct = StaticData(jnp.asarray(statics.grid_node_features))
    self.mesh_struct = StaticData(jnp.asarray(statics.mesh_node_features))
    self.g2m_edge_feats = StaticData(jnp.asarray(statics.grid2mesh.features))
    self.mm_edge_feats = StaticData(
        jnp.asarray(statics.multimesh_edges.features))
    m2g_feats = statics.mesh2grid.features
    if cfg.mesh2grid_edge_normalization_factor is not None:
      # The reference threads this factor into the m2g spatial-feature
      # normalization instead of the default max-edge-length
      # (graphcast/graphcast.py:327-328,583 -> common/model_utils.py:485-494).
      # GraphStatics stores [length, rel]/max_edge_length
      # (graph/features.py:109-112), so a custom factor is an exact
      # rescale by max_edge_length/factor. The receiver-local rotation
      # preserves norms, so max_edge_length needs only the edge endpoint
      # xyz positions — one cheap [E] numpy pass, not the [E,3,3]
      # rotation-table rebuild.
      import numpy as np
      from gencast_tpu.graph import features as features_lib
      grid_mesh_lon, grid_mesh_lat = np.meshgrid(statics.grid_lon,
                                                 statics.grid_lat)
      s_pos = features_lib.spherical_to_xyz(*features_lib.lat_lon_to_spherical(
          statics.mesh_lat, statics.mesh_lon))
      r_pos = features_lib.spherical_to_xyz(*features_lib.lat_lon_to_spherical(
          grid_mesh_lat.reshape(-1).astype(np.float32),
          grid_mesh_lon.reshape(-1).astype(np.float32)))
      max_len = float(np.linalg.norm(
          s_pos[statics.mesh2grid.senders]
          - r_pos[statics.mesh2grid.receivers], axis=-1).max())
      m2g_feats = (m2g_feats * np.float32(
          max_len / cfg.mesh2grid_edge_normalization_factor))
    self.m2g_edge_feats = StaticData(jnp.asarray(m2g_feats))

    num_nodes = {'grid': statics.num_grid_nodes,
                 'mesh': statics.num_mesh_nodes}
    num_data = self.input_layout.num_channels + \
        self.forcing_layout.num_channels

    common = dict(mlp_hidden_size=latent,
                  mlp_num_hidden_layers=cfg.hidden_layers,
                  activation='swish', use_layer_norm=True,
                  use_norm_conditioning=False, rngs=rngs)

    self.grid2mesh = TypedGraphNet(
        topologies=[self._plan(
            EdgeTopology('g2m', 'grid', 'mesh',
                         statics.grid2mesh.senders,
                         statics.grid2mesh.receivers),
            statics.num_grid_nodes, statics.num_mesh_nodes, cfg)],
        num_nodes=num_nodes,
        node_input_sizes={'grid': 3 + num_data, 'mesh': 3},
        edge_input_sizes={'g2m': 4},
        node_latent_size={'grid': latent, 'mesh': latent},
        edge_latent_size={'g2m': latent},
        num_message_passing_steps=1,
        f32_aggregation=True,
        edge_chunk_size=cfg.edge_chunk_size,
        **common)

    self.mesh_gnn = TypedGraphNet(
        topologies=[self._plan(
            EdgeTopology('mesh', 'mesh', 'mesh',
                         statics.multimesh_edges.senders,
                         statics.multimesh_edges.receivers),
            statics.num_mesh_nodes, statics.num_mesh_nodes, cfg)],
        num_nodes={'mesh': statics.num_mesh_nodes},
        node_input_sizes={},
        edge_input_sizes={'mesh': 4},
        node_latent_size={'mesh': latent},
        edge_latent_size={'mesh': latent},
        num_message_passing_steps=cfg.gnn_msg_steps,
        embed_nodes=False,
        f32_aggregation=False,
        remat_steps=cfg.remat,
        remat_group=cfg.remat_group,
        **common)

    self.mesh2grid = TypedGraphNet(
        topologies=[self._plan(
            EdgeTopology('m2g', 'mesh', 'grid',
                         statics.mesh2grid.senders,
                         statics.mesh2grid.receivers),
            statics.num_mesh_nodes, statics.num_grid_nodes, cfg)],
        num_nodes=num_nodes,
        node_input_sizes={},
        edge_input_sizes={'m2g': 4},
        node_latent_size={'grid': latent, 'mesh': latent},
        edge_latent_size={'m2g': latent},
        num_message_passing_steps=1,
        embed_nodes=False,
        node_output_sizes={'grid': self.target_layout.num_channels},
        f32_aggregation=False,
        edge_chunk_size=cfg.edge_chunk_size,
        **common)

    lat_w = layout_lib.latitude_weights(statics.grid_lat)
    chan_w, diag_w = layout_lib.loss_channel_weights(
        self.target_layout, LOSS_WEIGHTS_SURFACE)
    self.lat_weights = StaticData(jnp.asarray(lat_w))
    self.loss_weights = StaticData(jnp.asarray(chan_w))
    self._diag_weights = diag_w

  def predict(self, inputs: jnp.ndarray, forcings: jnp.ndarray,
              key: Optional[jax.Array] = None) -> jnp.ndarray:
    """One forward step: [B, lat, lon, C_in] -> [B, lat, lon, C_tgt]."""
    del key  # deterministic
    b = inputs.shape[0]
    dtype = inputs.dtype
    g = self.num_lat * self.num_lon
    grid_data = jnp.concatenate([inputs, forcings], axis=-1)
    node_data = grid_data.reshape(b, g, -1).transpose(1, 0, 2)

    def bcast(feat):
      return jnp.broadcast_to(feat[:, None, :].astype(dtype),
                              (feat.shape[0], b, feat.shape[1]))

    grid_in = jnp.concatenate([bcast(self.grid_struct[...]), node_data], -1)

    def run_g2m(grid_in, mesh_in, edge_in):
      nodes, _ = self.grid2mesh({'grid': grid_in, 'mesh': mesh_in},
                                {'g2m': edge_in})
      return nodes['grid'], nodes['mesh']

    def run_m2g(latent_grid, latent_mesh, edge_in):
      nodes, _ = self.mesh2grid({'grid': latent_grid, 'mesh': latent_mesh},
                                {'m2g': edge_in})
      return nodes['grid']

    if self._remat:
      # Whole-GNN remat for encoder/decoder (the grid-node MLP hiddens
      # are [1.04M, latent]-sized at 0.25 degrees); the per-MP-step remat
      # inside mesh_gnn is configured at construction (remat_steps).
      run_g2m = jax.checkpoint(run_g2m)
      run_m2g = jax.checkpoint(run_m2g)

    latent_grid, latent_mesh = run_g2m(
        grid_in, bcast(self.mesh_struct[...]),
        bcast(self.g2m_edge_feats[...]))

    nodes, _ = self.mesh_gnn({'mesh': latent_mesh},
                             {'mesh': bcast(self.mm_edge_feats[...])})
    latent_mesh = nodes['mesh']

    out = run_m2g(latent_grid, latent_mesh,
                  bcast(self.m2g_edge_feats[...]))  # [G, B, C_tgt]
    return out.transpose(1, 0, 2).reshape(b, self.num_lat, self.num_lon, -1)

  def __call__(self, inputs, forcings):
    return self.predict(inputs, forcings)

  def loss_and_predictions(self, inputs, targets, forcings,
                           key: Optional[jax.Array] = None):
    preds = self.predict(inputs, forcings)
    loss = losses.weighted_mse(preds, targets, self.lat_weights[...],
                               self.loss_weights[...])
    diags = losses.per_variable_diagnostics(
        preds, targets, self.lat_weights[...], self.target_layout,
        self._diag_weights)
    return (loss, diags), preds

  def loss(self, inputs: jnp.ndarray, targets: jnp.ndarray,
           forcings: jnp.ndarray, key: Optional[jax.Array] = None
           ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    (loss, diags), _ = self.loss_and_predictions(inputs, targets, forcings)
    return loss, diags
