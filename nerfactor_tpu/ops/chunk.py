"""Static-shape chunked application for memory-bounded batched evals.

The reference inserts Python chunk loops everywhere (SURVEY.md section
2.8); under XLA the equivalent is a ``lax.map`` over equal-size chunks of
a padded array -- compiled once, static shapes, no host sync.
"""

import jax
import jax.numpy as jnp


def chunked_apply(fn, x, chunk, out_dim=None):
    """Applies ``fn`` ((chunk, D) -> (chunk, out_dim)) over rows of
    ``x`` (N, D) in fixed-size chunks; N need not divide ``chunk``.

    For pytree outputs, ``fn`` may return any pytree whose leaves have
    leading dim ``chunk``.
    """
    n = x.shape[0]
    if n <= chunk:
        return fn(x)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
    xc = x.reshape((n_chunks, chunk) + x.shape[1:])
    out = jax.lax.map(fn, xc)
    return jax.tree_util.tree_map(
        lambda y: y.reshape((n_chunks * chunk,) + y.shape[2:])[:n], out)


def chunked_apply_tree(fn, tree, chunk):
    """Like :func:`chunked_apply` but over a pytree of arrays sharing the
    same leading dim N; ``fn`` maps a chunk-sized pytree to an output
    pytree whose leaves also lead with the chunk dim."""
    leaves = jax.tree_util.tree_leaves(tree)
    assert leaves, "Empty input tree"
    n = leaves[0].shape[0]
    if n <= chunk:
        return fn(tree)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    tree_c = jax.tree_util.tree_map(prep, tree)
    out = jax.lax.map(fn, tree_c)
    return jax.tree_util.tree_map(
        lambda y: y.reshape((n_chunks * chunk,) + y.shape[2:])[:n], out)
