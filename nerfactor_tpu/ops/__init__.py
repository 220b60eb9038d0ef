"""Pure-function numerics and physics primitives (JAX)."""
