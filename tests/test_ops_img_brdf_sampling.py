"""Tests for image ops, the GGX microfacet BRDF, and NeRF sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfactor_tpu.ops import img, microfacet, sampling


def test_linear2srgb_roundtrip():
    x = np.linspace(0, 1, 64).astype(np.float32)
    srgb = img.linear2srgb(x)
    # Known anchor points of the sRGB curve
    np.testing.assert_allclose(img.linear2srgb(np.float32(0.0)), 0.0,
                               atol=1e-6)
    np.testing.assert_allclose(img.linear2srgb(np.float32(1.0)), 1.0,
                               atol=1e-6)
    np.testing.assert_allclose(
        img.linear2srgb(np.float32(0.002)), 0.002 * 12.92, atol=1e-6)
    back = img.srgb2linear(srgb)
    np.testing.assert_allclose(back, x, atol=1e-5)
    # jnp path agrees with np path
    np.testing.assert_allclose(
        np.asarray(img.linear2srgb(jnp.array(x))), srgb, atol=1e-5)


def test_linear2srgb_grad_finite_at_zero():
    g = jax.grad(lambda x: jnp.sum(img.linear2srgb(x)))(jnp.zeros((3,)))
    assert np.isfinite(np.asarray(g)).all()


def test_alpha_blend():
    fg = np.full((4, 4, 3), 2.0, np.float32)
    bg = np.zeros((4, 4, 3), np.float32)
    alpha = np.full((4, 4), 0.25, np.float32)
    out = img.alpha_blend(fg, alpha, bg)
    np.testing.assert_allclose(out, 0.5)
    out = img.alpha_blend(fg, alpha)  # None bg = zeros
    np.testing.assert_allclose(out, 0.5)


def test_resize():
    x = np.random.RandomState(0).rand(16, 32, 3).astype(np.float32)
    y = img.resize(x, new_h=8)
    assert y.shape == (8, 16, 3)
    # Mean preserved approximately by antialiased downsampling
    np.testing.assert_allclose(y.mean(), x.mean(), atol=0.02)


def test_microfacet_lambert_only():
    rng = np.random.RandomState(0)
    n = 16
    pts2l = rng.randn(n, 8, 3).astype(np.float32)
    pts2c = rng.randn(n, 3).astype(np.float32)
    normal = rng.randn(n, 3).astype(np.float32)
    albedo = rng.rand(n, 3).astype(np.float32)
    out = np.asarray(microfacet.microfacet_brdf(
        jnp.array(pts2l), jnp.array(pts2c), jnp.array(normal),
        albedo=jnp.array(albedo), lambert_only=True))
    want = np.tile((albedo / np.pi)[:, None, :], (1, 8, 1))
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_microfacet_glossy_peak_at_mirror():
    # Fixed normal +Z, view at 45 deg; mirror light should have higher
    # specular than grazing light.
    normal = jnp.array([[0.0, 0.0, 1.0]])
    view = jnp.array([[1.0, 0.0, 1.0]]) / np.sqrt(2)
    mirror = jnp.array([[[-1.0, 0.0, 1.0]]]) / np.sqrt(2)
    grazing = jnp.array([[[0.0, 0.995, 0.1]]])
    albedo = jnp.zeros((1, 3))
    rough = jnp.array([[0.3]])
    b_mirror = microfacet.microfacet_brdf(mirror, view, normal,
                                          albedo=albedo, rough=rough)
    b_graze = microfacet.microfacet_brdf(grazing, view, normal,
                                         albedo=albedo, rough=rough)
    assert float(b_mirror[0, 0, 0]) > float(b_graze[0, 0, 0])
    assert np.isfinite(np.asarray(b_mirror)).all()


def test_microfacet_grad_finite():
    normal = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    view = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    lights = jnp.tile(view[:, None, :], (1, 3, 1))

    def f(rough):
        return jnp.sum(microfacet.microfacet_brdf(
            lights, view, normal, rough=rough))

    g = jax.grad(f)(jnp.full((2, 1), 0.3))
    assert np.isfinite(np.asarray(g)).all()


def test_gen_z_deterministic():
    z = np.asarray(sampling.gen_z(2.0, 6.0, 5, 3))
    assert z.shape == (3, 5)
    np.testing.assert_allclose(z[0], np.linspace(2, 6, 5), rtol=1e-6)
    # Disparity sampling
    z = np.asarray(sampling.gen_z(2.0, 6.0, 3, 1, lin_in_disp=True))
    np.testing.assert_allclose(z[0], [2.0, 3.0, 6.0], rtol=1e-5)


def test_gen_z_perturbed_within_bins():
    key = jax.random.PRNGKey(0)
    z = np.asarray(sampling.gen_z(2.0, 6.0, 64, 10, perturb=True, key=key))
    assert (z >= 2.0).all() and (z <= 6.0).all()
    assert (np.diff(z, axis=1) >= 0).all()


def test_accumulate_sigma_opaque_wall():
    # A single huge sigma at sample k should put ~all weight at k
    n_rays, n_samples = 2, 8
    sigma = np.zeros((n_rays, n_samples), np.float32)
    sigma[:, 3] = 1e6
    z = np.tile(np.linspace(2, 6, n_samples), (n_rays, 1)).astype(np.float32)
    rayd = np.tile([[0.0, 0.0, 1.0]], (n_rays, 1)).astype(np.float32)
    w = np.asarray(sampling.accumulate_sigma(
        jnp.array(sigma), jnp.array(z), jnp.array(rayd)))
    assert w.shape == (n_rays, n_samples)
    np.testing.assert_allclose(w[:, 3], 1.0, atol=1e-4)
    np.testing.assert_allclose(w[:, :3], 0.0, atol=1e-4)
    # Weights sum <= 1
    sigma = np.random.RandomState(0).rand(4, 8).astype(np.float32)
    w = np.asarray(sampling.accumulate_sigma(
        jnp.array(sigma), jnp.array(z[:1].repeat(4, 0)),
        jnp.array(rayd[:1].repeat(4, 0))))
    assert (w.sum(-1) <= 1.0 + 1e-5).all()


def test_accumulate_compositing():
    n_rays, n_samples = 3, 8
    rng = np.random.RandomState(0)
    rgb_sig = rng.randn(n_rays, n_samples, 4).astype(np.float32)
    z = np.tile(np.linspace(2, 6, n_samples), (n_rays, 1)).astype(np.float32)
    rayd = np.tile([[0, 0, 1.0]], (n_rays, 1)).astype(np.float32)
    weights = np.asarray(sampling.accumulate_sigma(
        jnp.array(rgb_sig[:, :, 3]), jnp.array(z), jnp.array(rayd)))
    out = sampling.accumulate(
        jnp.array(rgb_sig), jnp.array(z), jnp.array(weights), white_bg=True)
    rgb = np.asarray(out['rgb'])
    occu = np.asarray(out['occu'])
    assert rgb.shape == (n_rays, 3)
    assert (rgb >= 0).all() and (rgb <= 1 + 1e-5).all()
    # Empty space -> white bg
    empty_w = np.zeros_like(weights)
    out = sampling.accumulate(
        jnp.array(rgb_sig), jnp.array(z), jnp.array(empty_w), white_bg=True)
    np.testing.assert_allclose(np.asarray(out['rgb']), 1.0, atol=1e-6)
    del occu
