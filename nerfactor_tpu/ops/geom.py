"""Differentiable geometry: local frames, Rusinkiewicz coordinates, slerp.

Behavioral contracts (with reference citations):
  * :func:`gen_world2local` -- nerfactor/util/geom.py:119-149;
  * :func:`dir2rusink` -- nerfactor/util/geom.py:152-192 (itself adapted
    from third_party/nielsen2015on/coordinateFunctions.py:117-129);
  * :func:`slerp` -- nerfactor/util/geom.py:100-116.

All functions are shape-static, jit-safe and NaN-safe in backward via the
custom-gradient math in :mod:`nerfactor_tpu.ops.math`.
"""

import jax.numpy as jnp

from nerfactor_tpu.ops import math as mathops


def gen_world2local(normal, eps=1e-6):
    """Rotation matrices taking world vectors into local frames where the
    normal is +Z (tangent -> +X, binormal -> +Y).

    Args:
      normal: (N, 3), need not be unit length.

    Returns:
      (N, 3, 3) whose rows are [tangent, binormal, normal].
    """
    normal = mathops.safe_l2_normalize(normal, axis=1)
    # Fixed up-ish axis, slightly perturbed to avoid colinearity with
    # special normals like (0, 0, 1).
    z = jnp.asarray((0.0, 0.0, 1.0), dtype=normal.dtype) + eps
    z = jnp.broadcast_to(z[None, :], normal.shape)
    t = jnp.cross(normal, z)
    t = mathops.safe_l2_normalize(t, axis=1)
    b = jnp.cross(normal, t)
    b = mathops.safe_l2_normalize(b, axis=1)
    return jnp.stack((t, b, normal), axis=1)


def _rot_vec(vector, axis, angle):
    """Rodrigues rotation of ``vector`` (N, 3) around unit ``axis`` by
    per-row ``angle`` (N,)."""
    cos_ang = jnp.reshape(jnp.cos(angle), (-1, 1))
    sin_ang = jnp.reshape(jnp.sin(angle), (-1, 1))
    axis = jnp.reshape(jnp.asarray(axis, dtype=vector.dtype), (1, 3))
    dot = vector @ axis.T  # (N, 1)
    return (vector * cos_ang
            + axis * dot * (1.0 - cos_ang)
            + jnp.cross(jnp.broadcast_to(axis, vector.shape), vector)
            * sin_ang)


def dir2rusink(a, b):
    """Converts two direction batches (in the local shading frame) to
    Rusinkiewicz coordinates (phi_d, theta_h, theta_d).

    Args:
      a, b: (N, 3). Conventionally ``a`` is the light direction and ``b``
        the view direction (the transform is symmetric up to phi_d's mod-pi).

    Returns:
      (N, 3) of (phi_d, theta_h, theta_d), phi_d in [0, pi).
    """
    a = mathops.safe_l2_normalize(a, axis=1)
    b = mathops.safe_l2_normalize(b, axis=1)
    h = mathops.safe_l2_normalize((a + b) / 2.0, axis=1)

    theta_h = mathops.safe_acos(h[:, 2])
    phi_h = mathops.safe_atan2(h[:, 1], h[:, 0])

    binormal = (0.0, 1.0, 0.0)
    normal = (0.0, 0.0, 1.0)
    diff = _rot_vec(_rot_vec(b, normal, -phi_h), binormal, -theta_h)
    # When a == b, diff lies along +h: theta_d = 0 and phi_d is undefined;
    # safe_atan2 keeps the backward pass finite there.
    theta_d = mathops.safe_acos(diff[:, 2])
    phi_d = jnp.mod(mathops.safe_atan2(diff[:, 1], diff[:, 0]), jnp.pi)
    return jnp.stack((phi_d, theta_h, theta_d), axis=1)


def slerp(p0, p1, t):
    """Spherical linear interpolation between two unit latent codes.

    ``p0``/``p1`` are 2D with one singleton dimension (reference
    util/geom.py:100-116).
    """
    assert p0.ndim == p1.ndim == 2, "Vectors must be 2D"
    if p0.shape[0] == 1:
        cos_omega = p0 @ p1.T
    elif p0.shape[1] == 1:
        cos_omega = p0.T @ p1
    else:
        raise ValueError("Vectors should have one singleton dimension")
    omega = mathops.safe_acos(cos_omega)
    z0 = p0 * jnp.sin((1 - t) * omega) / jnp.sin(omega)
    z1 = p1 * jnp.sin(t * omega) / jnp.sin(omega)
    return z0 + z1
