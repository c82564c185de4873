"""Model families: GenCast (EDM diffusion) and GraphCast (deterministic)."""
