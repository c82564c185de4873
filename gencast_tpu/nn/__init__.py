"""Neural-net building blocks (flax NNX)."""
