"""Numerically safe math with custom gradients.

These reproduce the *required behavior* of the reference's safe-gradient
functions (see /root/reference/nerfactor/util/math.py:24-94): the
Rusinkiewicz transform genuinely NaNs in the backward pass without them.
Implemented as ``jax.custom_jvp`` so they compose with both forward- and
reverse-mode autodiff under ``jit``.
"""

import jax
import jax.numpy as jnp

EPS = 1e-6


def log10(x):
    return jnp.log(x) / jnp.log(jnp.asarray(10.0, dtype=jnp.result_type(x)))


@jax.custom_jvp
def safe_atan2(a, b):
    """``arctan2(a, b)`` whose gradient is finite at (0, 0).

    Gradient: d/da = b / (a^2 + b^2 + eps), d/db = -a / (a^2 + b^2 + eps)
    (reference: util/math.py:25-38).
    """
    return jnp.arctan2(a, b)


@safe_atan2.defjvp
def _safe_atan2_jvp(primals, tangents):
    a, b = primals
    da, db = tangents
    z = jnp.arctan2(a, b)
    denom = a ** 2 + b ** 2 + EPS
    dz = da * (b / denom) + db * (-a / denom)
    return z, dz


@jax.custom_jvp
def safe_acos(x):
    """``arccos(clip(x, -1, 1))`` with a large-but-finite gradient at +/-1.

    Gradient: -1 / (sqrt(1 - x^2 + eps) + eps) (reference: util/math.py:41-60).
    """
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


@safe_acos.defjvp
def _safe_acos_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    x_clip = jnp.clip(x, -1.0, 1.0)
    y = jnp.arccos(x_clip)
    denom = jnp.sqrt(1.0 - x_clip ** 2 + EPS) + EPS
    return y, dx * (-1.0 / denom)


def safe_l2_normalize(x, axis=None, eps=EPS):
    """Matches ``tf.linalg.l2_normalize``: x * rsqrt(max(sum(x^2), eps))."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


def safe_cumprod(x, eps=EPS):
    """Exclusive cumprod of (x + eps) along the last axis.

    Matches reference util/math.py:67-68 (``tf.math.cumprod(..., exclusive=
    True)``): output[..., i] = prod_{j<i} (x[..., j] + eps), output[..., 0]=1.
    """
    cp = jnp.cumprod(x + eps, axis=-1)
    ones = jnp.ones_like(cp[..., :1])
    return jnp.concatenate([ones, cp[..., :-1]], axis=-1)


def divide_no_nan(num, denom):
    """0 where denom == 0, matching ``tf.math.divide_no_nan``."""
    safe = jnp.where(denom == 0, jnp.ones_like(denom), denom)
    return jnp.where(denom == 0, jnp.zeros_like(num * safe), num / safe)


def inv_transform_sample(val, weights, n_samples, det=False, key=None,
                         eps=1e-5):
    """Inverse-transform (importance) sampling along rays.

    Reproduces reference util/math.py:71-94: builds a CDF from ``weights``
    over the bin centers ``val`` and draws ``n_samples`` per ray, either
    deterministically (linspace) or uniformly at random (requires ``key``).

    Args:
      val: (n_rays, n_bins) sample positions.
      weights: (n_rays, n_bins) unnormalized weights.
      n_samples: static int.
      det: deterministic (evenly spaced in CDF) when True.
      key: jax PRNG key, required when det is False.

    Returns:
      (n_rays, n_samples) sampled positions.
    """
    denom = jnp.sum(weights, axis=-1, keepdims=True) + eps
    pdf = weights / denom
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)

    n_rays, n_bins1 = cdf.shape
    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, (n_rays, n_samples))
    else:
        assert key is not None, "Non-deterministic sampling requires a key"
        u = jax.random.uniform(key, (n_rays, n_samples))

    # searchsorted(cdf, u, 'right') == #{j: cdf[j] <= u}, computed as one
    # fused compare+reduce; per-row gathers (take_along_axis) become
    # masked reductions. Row gathers and vmapped searchsorted are the
    # TPU-hostile ops here -- this formulation cut the geometry
    # distillation's visibility march from 65 s to 31 s per 4096 surface
    # points (v5e, 512 lights, bit-identical output) and speeds every
    # NeRF train step (importance resampling runs per step).
    ind = jnp.sum((u[:, :, None] >= cdf[:, None, :]).astype(jnp.int32),
                  axis=-1)
    below = jnp.maximum(0, ind - 1)
    above = jnp.minimum(ind, n_bins1 - 1)

    def sel(src, ids):
        iota = jnp.arange(src.shape[-1])
        picked = jnp.where(ids[:, :, None] == iota[None, None, :],
                           src[:, None, :], 0.0)
        return jnp.sum(picked, axis=-1)

    cdf_b = sel(cdf, below)
    cdf_a = sel(cdf, above)
    val_b = sel(val, jnp.minimum(below, val.shape[-1] - 1))
    val_a = sel(val, jnp.minimum(above, val.shape[-1] - 1))
    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return val_b + t * (val_a - val_b)
