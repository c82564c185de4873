"""Custom NNX variable types."""

import flax.nnx as nnx


class StaticData(nnx.Variable):
  """Non-trainable device-resident buffers (attention masks, graph indices).

  A distinct Variable type so optimizers (which target nnx.Param) and
  checkpoint filters can select or exclude them wholesale.
  """
