"""Offline BRDF physics: MERL database reader, Rusinkiewicz coordinate
transforms, and a NumPy sphere renderer for BRDF-prior data generation and
test visualization (CPU-only; not on the training hot path)."""
