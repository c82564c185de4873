"""Host-side geometry & graph construction ("graph compiler")."""
