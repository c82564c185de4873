"""Device-side compute ops (XLA + Pallas)."""
