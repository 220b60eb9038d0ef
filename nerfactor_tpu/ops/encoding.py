"""NeRF positional encoding as a pure function.

Reference behavior: nerfactor/networks/embedder.py:23-47 -- concat of
[x, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...] with octave
frequencies f = 2**linspace(0, n_freqs-1, n_freqs).
"""

import jax.numpy as jnp


def embed_dims(in_dims, n_freqs, incl_input=True):
    """Output dimensionality of :func:`posenc`."""
    out = 2 * n_freqs * in_dims
    if incl_input:
        out += in_dims
    return out


def freq_bands(n_freqs, log2_max_freq=None, log_sampling=True):
    if n_freqs == 0:
        return jnp.zeros((0,), dtype=jnp.float32)
    if log2_max_freq is None:
        log2_max_freq = n_freqs - 1
    if log_sampling:
        return 2.0 ** jnp.linspace(0.0, float(log2_max_freq), n_freqs)
    return jnp.linspace(1.0, 2.0 ** log2_max_freq, n_freqs)


def posenc(x, n_freqs, incl_input=True, log_sampling=True):
    """Positional-encode the last axis of ``x``.

    Returns (..., embed_dims(x.shape[-1], n_freqs, incl_input)).
    The feature order matches the reference embedder exactly:
    [x?, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...].
    """
    if n_freqs == 0:
        return x if incl_input else x[..., :0]
    bands = freq_bands(n_freqs, log_sampling=log_sampling)
    # (..., D, F)
    xf = x[..., None] * bands
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    # Interleave per frequency: (..., D, F, 2) -> (..., F, 2, D) flat
    # Reference order is [sin(f*x_all_dims), cos(f*x_all_dims)] per f.
    feats = jnp.stack([sin, cos], axis=-1)  # (..., D, F, 2)
    feats = jnp.moveaxis(feats, -3, -1)  # (..., F, 2, D)
    feats = feats.reshape(feats.shape[:-3] + (-1,))
    if incl_input:
        return jnp.concatenate([x, feats], axis=-1)
    return feats
