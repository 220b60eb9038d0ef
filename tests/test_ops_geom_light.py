"""Tests for local frames, Rusinkiewicz transform, light sphere, encoding."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfactor_tpu.ops import geom, light, encoding


def _np_dir2rusink_oracle(a, b):
    """NumPy oracle following the Rusinkiewicz definition (Nielsen et al.
    2015 convention): half-vector angles + difference vector angles."""
    def normalize(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    def rot(vec, axis, angle):
        axis = np.asarray(axis, float)
        c, s = np.cos(angle), np.sin(angle)
        return (vec * c[:, None]
                + axis[None, :] * (vec @ axis)[:, None] * (1 - c)[:, None]
                + np.cross(np.tile(axis, (len(vec), 1)), vec) * s[:, None])

    a, b = normalize(a), normalize(b)
    h = normalize((a + b) / 2)
    theta_h = np.arccos(np.clip(h[:, 2], -1, 1))
    phi_h = np.arctan2(h[:, 1], h[:, 0])
    diff = rot(rot(b, (0, 0, 1), -phi_h), (0, 1, 0), -theta_h)
    theta_d = np.arccos(np.clip(diff[:, 2], -1, 1))
    phi_d = np.mod(np.arctan2(diff[:, 1], diff[:, 0]), np.pi)
    return np.stack([phi_d, theta_h, theta_d], axis=1)


def _random_upper_dirs(rng, n):
    v = rng.randn(n, 3)
    v[:, 2] = np.abs(v[:, 2]) + 0.1
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


def test_dir2rusink_matches_oracle():
    rng = np.random.RandomState(0)
    a = _random_upper_dirs(rng, 256)
    b = _random_upper_dirs(rng, 256)
    got = np.asarray(geom.dir2rusink(jnp.array(a), jnp.array(b)))
    want = _np_dir2rusink_oracle(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-3)
    assert (got[:, 0] >= 0).all() and (got[:, 0] <= np.pi + 1e-5).all()


def test_dir2rusink_grad_finite_when_a_equals_b():
    a = jnp.array([[0.0, 0.0, 1.0], [0.3, 0.4, 0.866]], dtype=jnp.float32)

    def f(x):
        return jnp.sum(geom.dir2rusink(x, x))

    g = jax.grad(f)(a)
    assert np.isfinite(np.asarray(g)).all()


def test_gen_world2local_properties():
    rng = np.random.RandomState(1)
    n = rng.randn(128, 3).astype(np.float32)
    rot = np.asarray(geom.gen_world2local(jnp.array(n)))
    # Orthonormal rows
    eye = np.einsum('nij,nkj->nik', rot, rot)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (128, 1, 1)),
                               atol=1e-4)
    # Normal maps to +Z
    n_unit = n / np.linalg.norm(n, axis=1, keepdims=True)
    local_n = np.einsum('nij,nj->ni', rot, n_unit)
    np.testing.assert_allclose(local_n[:, 2], np.ones(128), atol=1e-4)
    np.testing.assert_allclose(local_n[:, :2], np.zeros((128, 2)), atol=1e-3)
    # Right-handed: det = +1
    np.testing.assert_allclose(np.linalg.det(rot), np.ones(128), atol=1e-4)


def test_gen_world2local_special_normals():
    # +Z / -Z / axis-aligned normals must not produce zero or NaN tangents.
    # (For exactly +/-Z normals the epsilon clamp in safe_l2_normalize
    # yields tiny-but-nonzero tangents -- same behavior as the reference's
    # tf.linalg.l2_normalize(eps=1e-6) at util/geom.py:128-137.)
    n = jnp.array([[0, 0, 1], [0, 0, -1], [1, 0, 0], [0, 1, 0]],
                  dtype=jnp.float32)
    rot = np.asarray(geom.gen_world2local(n))
    assert np.isfinite(rot).all()
    norms = np.linalg.norm(rot, axis=2)
    assert (norms > 0).all()


def test_gen_light_xyz():
    xyz, areas = light.gen_light_xyz(16, 32)
    assert xyz.shape == (16, 32, 3)
    assert areas.shape == (16, 32)
    # All points on the sphere of radius 100
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=2), 100.0, rtol=1e-6)
    # Solid angles positive; weighted by sin(colatitude): equator rows
    # bigger than polar rows
    assert (areas > 0).all()
    assert areas[8, 0] > areas[0, 0]
    # Normalized over the whole grid: total solid angle is 4 pi
    np.testing.assert_allclose(areas.sum(), 4 * np.pi, rtol=1e-6)
    # Top row is near the north pole (z ~ +100) and first column faces lng
    # near +pi (x ~ -cos(lat)): spot-check hemisphere signs
    assert xyz[0, :, 2].mean() > 90
    assert xyz[-1, :, 2].mean() < -90


def test_slerp_endpoints():
    p0 = jnp.array([[1.0, 0.0, 0.0]])
    p1 = jnp.array([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(geom.slerp(p0, p1, 0.0)), np.asarray(p0), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(geom.slerp(p0, p1, 1.0)), np.asarray(p1), atol=1e-5)
    mid = np.asarray(geom.slerp(p0, p1, 0.5))
    np.testing.assert_allclose(np.linalg.norm(mid), 1.0, atol=1e-5)


def test_posenc_matches_oracle():
    x = np.random.RandomState(3).randn(7, 3).astype(np.float32)
    n_freqs = 4
    got = np.asarray(encoding.posenc(jnp.array(x), n_freqs))
    # Oracle: [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]
    freqs = 2.0 ** np.linspace(0, n_freqs - 1, n_freqs)
    parts = [x]
    for f in freqs:
        parts.append(np.sin(x * f))
        parts.append(np.cos(x * f))
    want = np.concatenate(parts, axis=-1)
    assert got.shape[-1] == encoding.embed_dims(3, n_freqs)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_posenc_no_input():
    x = jnp.ones((5, 2))
    out = encoding.posenc(x, 3, incl_input=False)
    assert out.shape == (5, 12)


def test_make_olat_envmaps():
    olat = light.make_olat_envmaps(4, 8, olat_inten=100.0)
    assert len(olat) == 32
    env = olat['0001-0002']
    assert env.shape == (4, 8, 3)
    assert env[1, 2, 0] == 100.0
    assert env.sum() == 300.0
