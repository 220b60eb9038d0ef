"""NeRF ray sampling and volume-rendering accumulation.

Pure functions replacing models/nerf.py:120-254 of the reference; there is
no chunking here -- shapes are static and XLA tiles everything onto the
MXU/VPU directly.
"""

import jax
import jax.numpy as jnp

from nerfactor_tpu.ops.math import safe_cumprod, inv_transform_sample


def gen_z(near, far, n_samples, n_rays, lin_in_disp=False, perturb=False,
          key=None):
    """Stratified depths along rays: (n_rays, n_samples)."""
    t = jnp.linspace(0.0, 1.0, n_samples)
    if lin_in_disp:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z = near * (1.0 - t) + far * t
    z = jnp.broadcast_to(z, (n_rays, n_samples))
    if perturb:
        assert key is not None, "Perturbed sampling requires a key"
        mid = 0.5 * (z[:, 1:] + z[:, :-1])
        upper = jnp.concatenate([mid, z[:, -1:]], axis=-1)
        lower = jnp.concatenate([z[:, :1], mid], axis=-1)
        t_rand = jax.random.uniform(key, z.shape)
        z = lower + (upper - lower) * t_rand
    return z


def gen_z_fine(z_coarse, weights, n_samples_fine, perturb=False, key=None):
    """Importance-resamples depths from coarse weights; returns the sorted
    union of coarse + fine depths (n_rays, n_coarse + n_fine)."""
    mid = 0.5 * (z_coarse[:, 1:] + z_coarse[:, :-1])
    z_fine = inv_transform_sample(
        mid, weights[..., 1:-1], n_samples_fine, det=not perturb, key=key)
    z_fine = jax.lax.stop_gradient(z_fine)
    return jnp.sort(jnp.concatenate((z_coarse, z_fine), axis=-1), axis=-1)


def accumulate_sigma(sigma, z, rayd, noise_std=0.0, key=None, inf=1e10):
    """sigma (n_rays, n_samples) -> compositing weights (same shape).

    weights[i] = alpha_i * prod_{j<i}(1 - alpha_j),
    alpha_i = 1 - exp(-relu(sigma_i + noise) * dist_i).
    """
    dist = z[:, 1:] - z[:, :-1]
    dist = jnp.concatenate(
        [dist, jnp.full_like(dist[:, :1], inf)], axis=-1)
    dist = dist * jnp.linalg.norm(rayd[:, None, :], axis=-1)
    if noise_std > 0:
        assert key is not None, "Sigma noise requires a key"
        sigma = sigma + jax.random.normal(key, sigma.shape) * noise_std
    density = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dist)
    return density * safe_cumprod(1.0 - density)


def accumulate(rgb_sig, z, weights, white_bg, eps=1e-10):
    """Composites per-sample raw (rgb, sigma) into per-ray outputs.

    Args:
      rgb_sig: (n_rays, n_samples, 4) raw network output; rgb passes
        through sigmoid here, sigma was already consumed into ``weights``.
      z: (n_rays, n_samples) depths.
      weights: (n_rays, n_samples) from :func:`accumulate_sigma`.
      white_bg: composite onto white (True) or black (False).

    Returns:
      dict with 'rgb' (n_rays, 3), 'occu', 'depth', 'disp' (n_rays,).
    """
    rgb = jax.nn.sigmoid(rgb_sig[:, :, :3])
    occu = jnp.sum(weights, axis=-1)
    rgb = jnp.sum(weights[:, :, None] * rgb, axis=-2)
    depth = jnp.sum(weights * z, axis=-1)
    disp = 1.0 / jnp.maximum(depth, eps)
    bg = jnp.ones_like(rgb) if white_bg else jnp.zeros_like(rgb)
    rgb = rgb * occu[:, None] + bg * (1.0 - occu[:, None])
    return {'rgb': rgb, 'occu': occu, 'depth': depth, 'disp': disp}
