"""Training & evaluation harness."""
