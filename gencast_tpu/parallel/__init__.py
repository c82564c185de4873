"""Device meshes, sharding, and ensemble parallelism."""
