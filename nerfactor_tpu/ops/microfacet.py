"""Differentiable GGX microfacet BRDF (Walter et al., EGSR '07).

Pure tensor math; behavioral contract is brdf/microfacet/microfacet.py in
the reference (D at :93, G at :75, Schlick Fresnel at :106).
"""

import jax
import jax.numpy as jnp

from nerfactor_tpu.ops.math import safe_l2_normalize, divide_no_nan


def microfacet_spec(pts2l, pts2c, normal, rough=None, default_rough=0.3,
                    f0=0.91):
    """Achromatic GGX specular lobe F*G*D / (4 |l.n| |v.n|).

    The full microfacet BRDF is channel-rank-structured:
    ``albedo/pi + spec[..., None]`` -- keeping the (N, L) specular
    factor separate lets the renderer contract it against lights as an
    MXU matmul without materializing the (N, L, 3) BRDF tensor
    (models/nerfactor.py render()).

    Args:
      pts2l: (N, L, 3) surface-to-light directions.
      pts2c: (N, 3) surface-to-camera directions.
      normal: (N, 3).
      rough: (N, 1) or None (defaults to ``default_rough``).

    Returns:
      (N, L) specular BRDF values.
    """
    n = pts2c.shape[0]
    if rough is None:
        rough = default_rough * jnp.ones((n, 1), dtype=pts2c.dtype)
    pts2l = safe_l2_normalize(pts2l, axis=2)
    pts2c = safe_l2_normalize(pts2c, axis=1)
    normal = safe_l2_normalize(normal, axis=1)
    # Half vectors
    h = pts2l + pts2c[:, None, :]
    h = safe_l2_normalize(h, axis=2)
    f = _fresnel_schlick(pts2l, h, f0)  # (N, L)
    alpha = rough ** 2
    d = _distribution_ggx(h, normal, alpha)  # (N, L)
    g = _geometry_ggx(pts2c, h, normal, alpha)  # (N, L)
    # HIGHEST: the TPU default would truncate f32 operands to bf16
    hi = jax.lax.Precision.HIGHEST
    l_dot_n = jnp.einsum('ijk,ik->ij', pts2l, normal, precision=hi)
    v_dot_n = jnp.einsum('ij,ij->i', pts2c, normal, precision=hi)
    denom = 4 * jnp.abs(l_dot_n) * jnp.abs(v_dot_n)[:, None]
    return divide_no_nan(f * g * d, denom)  # (N, L)


def microfacet_brdf(pts2l, pts2c, normal, albedo=None, rough=None,
                    default_rough=0.3, lambert_only=False, f0=0.91):
    """Evaluates the GGX microfacet BRDF in world coordinates.

    Args:
      pts2l: (N, L, 3) surface-to-light directions.
      pts2c: (N, 3) surface-to-camera directions.
      normal: (N, 3).
      albedo: (N, 3) or None (defaults to 1).
      rough: (N, 1) or None (defaults to ``default_rough``).

    Returns:
      (N, L, 3) BRDF values.
    """
    n = pts2c.shape[0]
    if albedo is None:
        albedo = jnp.ones((n, 3), dtype=pts2c.dtype)
    lambert = albedo / jnp.pi
    glossy_shape = (n, pts2l.shape[1], 3)
    brdf_diffuse = jnp.broadcast_to(lambert[:, None, :], glossy_shape)
    if lambert_only:
        return brdf_diffuse
    microfacet = microfacet_spec(pts2l, pts2c, normal, rough=rough,
                                 default_rough=default_rough, f0=f0)
    brdf_glossy = jnp.tile(microfacet[:, :, None], (1, 1, 3))
    return brdf_glossy + brdf_diffuse


def _geometry_ggx(v, m, n, alpha):
    """GGX geometric attenuation G(v, m)."""
    cos_theta_v = jnp.einsum('ij,ij->i', n, v)  # (N,)
    cos_theta = jnp.einsum('ijk,ik->ij', m, v)  # (N, L)
    div = divide_no_nan(cos_theta, cos_theta_v[:, None])
    chi = jnp.where(div > 0, 1.0, 0.0)
    cos_theta_v_sq = jnp.clip(jnp.square(cos_theta_v), 0.0, 1.0)
    tan_theta_v_sq = divide_no_nan(1.0 - cos_theta_v_sq, cos_theta_v_sq)
    tan_theta_v_sq = jnp.clip(tan_theta_v_sq, 0.0, jnp.inf)
    denom = 1 + jnp.sqrt(1 + alpha ** 2 * tan_theta_v_sq[:, None])
    return divide_no_nan(chi * 2, denom)


def _distribution_ggx(m, n, alpha):
    """GGX normal distribution D(m)."""
    cos_theta_m = jnp.einsum('ijk,ik->ij', m, n)  # (N, L)
    chi = jnp.where(cos_theta_m > 0, 1.0, 0.0)
    cos_theta_m_sq = jnp.square(cos_theta_m)
    tan_theta_m_sq = divide_no_nan(1.0 - cos_theta_m_sq, cos_theta_m_sq)
    denom = jnp.pi * jnp.square(cos_theta_m_sq) * jnp.square(
        alpha ** 2 + tan_theta_m_sq)
    return divide_no_nan(alpha ** 2 * chi, denom)


def _fresnel_schlick(l, m, f0):
    cos_theta = jnp.einsum('ijk,ijk->ij', l, m,
                           precision=jax.lax.Precision.HIGHEST)
    return f0 + (1 - f0) * (1 - cos_theta) ** 5
