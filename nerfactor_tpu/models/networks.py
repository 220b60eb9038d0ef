"""Functional network building blocks: skip-MLPs and GLO latent codes.

Parameters are plain pytrees (lists/dicts of jnp arrays); application is a
pure function -- the idiomatic JAX replacement for the reference's
Keras-layer containers (nerfactor/networks/{mlp,seq,base,layers}.py).

Initialization matches Keras Dense defaults (glorot-uniform kernels, zero
biases) so training dynamics are comparable.
"""

import math

import jax
import jax.numpy as jnp

from nerfactor_tpu.ops.math import safe_l2_normalize
from nerfactor_tpu.ops import geom

ACTS = {
    None: lambda x: x,
    'none': lambda x: x,
    'relu': jax.nn.relu,
    'sigmoid': jax.nn.sigmoid,
    'softplus': jax.nn.softplus,
    'tanh': jnp.tanh,
}


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def init_mlp(key, in_dim, widths, skip_at=None):
    """Initializes a Dense stack with optional input-skip concat.

    After layer i (0-indexed) in ``skip_at``, the ORIGINAL input is
    concatenated onto that layer's activation (reference
    networks/mlp.py:39-50), so the next layer's fan-in grows by ``in_dim``.

    Returns a list of {'w': (din, dout), 'b': (dout,)} dicts.
    """
    skip_at = set(skip_at or ())
    params = []
    din = in_dim
    for i, w in enumerate(widths):
        key, sub = jax.random.split(key)
        params.append({'w': glorot_uniform(sub, (din, w)),
                       'b': jnp.zeros((w,))})
        din = w + (in_dim if i in skip_at else 0)
    return params


# When set (e.g. jnp.bfloat16), matmul operands are cast down so the MXU
# runs at its native precision; accumulation stays float32. Halves the
# HBM traffic of the (rays x lights, width) activations.
MATMUL_DTYPE = None


def _matmul(x, w):
    if MATMUL_DTYPE is not None:
        return jax.lax.dot(
            x.astype(MATMUL_DTYPE), w.astype(MATMUL_DTYPE),
            preferred_element_type=jnp.float32)
    if x.dtype == jnp.float32 and w.dtype == jnp.float32:
        # The TPU default truncates f32 matmul operands to bf16 on the
        # MXU; an f32 path must ask for HIGHEST to actually be f32
        return jax.lax.dot(x, w, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    return x @ w


def apply_mlp(params, x, acts=None, skip_at=None, compute_dtype=None):
    """Applies a skip-MLP. ``acts`` is a list of activation names (or a
    single name applied to all layers).

    ``compute_dtype`` (e.g. bf16) casts inputs, weights, and
    pre-activations so every saved residual is half-width -- the lever
    for HBM-bound sample-scale evaluations (matmuls still accumulate
    f32 via _matmul's preferred_element_type when MATMUL_DTYPE is set,
    or natively for bf16 operands). Output is returned as f32.
    """
    depth = len(params)
    if acts is None or isinstance(acts, str):
        acts = [acts] * depth
    skip_at = set(skip_at or ())
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    x_in = x
    y = x
    for i, (layer, act) in enumerate(zip(params, acts)):
        w, b = layer['w'], layer['b']
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
            b = b.astype(compute_dtype)
        y = _matmul(y, w) + b
        if compute_dtype is not None:
            y = y.astype(compute_dtype)
        y = ACTS[act](y)
        if i in skip_at:
            y = jnp.concatenate((y, x_in), axis=-1)
    return y.astype(jnp.float32) if compute_dtype is not None else y


class MLPSpec:
    """Static description of one named MLP: shapes + activations.

    Bundles what the reference spreads across mlp.Network construction
    sites so a model can declare its nets declaratively and keep apply()
    pure.
    """

    def __init__(self, in_dim, widths, acts=None, skip_at=None):
        self.in_dim = in_dim
        self.widths = list(widths)
        self.acts = acts
        self.skip_at = list(skip_at) if skip_at else None

    def init(self, key):
        return init_mlp(key, self.in_dim, self.widths, self.skip_at)

    def apply(self, params, x, compute_dtype=None):
        return apply_mlp(params, x, self.acts, self.skip_at,
                         compute_dtype=compute_dtype)

    @property
    def out_dim(self):
        """Output dim, including the input concat if the last layer is a
        skip layer (Keras Dense infers fan-in lazily; here heads must size
        themselves off this)."""
        out = self.widths[-1]
        if self.skip_at and (len(self.widths) - 1) in self.skip_at:
            out += self.in_dim
        return out


def init_latent_code(key, n_iden, dim, mean=0.0, std=1.0):
    """GLO latent table (reference networks/layers.py:24-44)."""
    return mean + std * jax.random.normal(key, (n_iden, dim))


def latent_code_z(z_table, normalize=False):
    if normalize:
        return safe_l2_normalize(z_table, axis=1)
    return z_table


def latent_code_lookup(z_table, ind, normalize=False):
    return latent_code_z(z_table, normalize)[ind]


def latent_code_interp(z_table, w1, i1, w2, i2, normalize=False):
    """lerp (or slerp on the unit sphere) between two identities."""
    z = latent_code_z(z_table, normalize)
    z1, z2 = z[i1][None, :], z[i2][None, :]
    if normalize:
        assert abs(w1 + w2 - 1.0) < 1e-6, \
            "When latent codes are normalized, weights must sum to 1"
        return geom.slerp(z1, z2, w2)
    return w1 * z1 + w2 * z2
