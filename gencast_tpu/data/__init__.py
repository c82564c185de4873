"""Data model: packed arrays + static channel metadata (no xarray on device)."""
