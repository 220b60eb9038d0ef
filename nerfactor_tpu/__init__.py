"""nerfactor_tpu: a TPU-native JAX framework with the capabilities of
google/nerfactor (neural factorization of shape and reflectance under an
unknown illumination).

Design stance (not a port of the TF2 reference):
  * functional core -- parameters are plain pytrees, every hot path is a
    pure function compiled once under ``jax.jit``;
  * static shapes everywhere -- foreground masking is ``where``-masked
    dense compute instead of ``boolean_mask``/``scatter_nd``;
  * data-parallel sharding of rays over a ``jax.sharding.Mesh``;
  * Pallas kernels for the fused embed->MLP chains on the hot paths.

Layer map (mirrors SURVEY.md section 1 of the repo root):
  ops/       pure numerics and physics (safe-grad math, positional
             encoding, light sphere, Rusinkiewicz transform, GGX, NeRF
             ray sampling, image ops, Pallas kernels)
  models/    nerf, shape, brdf, nerfactor, nerfactor_microfacet
  datasets/  nerf, nerf_shape, mvs_shape, brdf_merl (NumPy + threads,
             replacing tf.data)
  parallel/  device mesh + sharded train/eval steps
  utils/     config (INI parity), io, checkpointing, logging, vis, metrics
"""

__version__ = "0.1.0"
