"""Offline data-generation tooling (CPU/NumPy), mirroring the
reference's data_gen/: MERL -> npz conversion, COLMAP real-capture
ingestion, DTU MVS ingestion, and Blender-Cycles synthetic rendering.
"""
