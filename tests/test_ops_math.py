"""Unit tests for safe-grad math against tiny NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfactor_tpu.ops import math as m


def test_log10():
    x = np.array([1.0, 10.0, 100.0, 0.5])
    np.testing.assert_allclose(np.asarray(m.log10(jnp.array(x))),
                               np.log10(x), rtol=1e-5)


def test_safe_atan2_forward():
    a = np.random.RandomState(0).randn(100)
    b = np.random.RandomState(1).randn(100)
    np.testing.assert_allclose(
        np.asarray(m.safe_atan2(jnp.array(a), jnp.array(b))),
        np.arctan2(a, b), rtol=1e-6)


def test_safe_atan2_grad_finite_at_origin():
    g = jax.grad(lambda a, b: m.safe_atan2(a, b), argnums=(0, 1))(0.0, 0.0)
    assert np.isfinite(g[0]) and np.isfinite(g[1])
    # And matches the analytic safe gradient elsewhere
    ga, gb = jax.grad(lambda a, b: m.safe_atan2(a, b), argnums=(0, 1))(
        1.0, 2.0)
    denom = 1.0 + 4.0 + 1e-6
    np.testing.assert_allclose(ga, 2.0 / denom, rtol=1e-5)
    np.testing.assert_allclose(gb, -1.0 / denom, rtol=1e-5)


def test_safe_acos_forward_and_grad():
    x = np.linspace(-1, 1, 11)
    np.testing.assert_allclose(np.asarray(m.safe_acos(jnp.array(x))),
                               np.arccos(x), rtol=1e-6)
    # Out-of-range inputs are clipped, gradient finite at the poles
    assert np.isfinite(float(jax.grad(m.safe_acos)(1.0)))
    assert np.isfinite(float(jax.grad(m.safe_acos)(-1.0)))
    assert float(m.safe_acos(1.5)) == pytest.approx(0.0)


def test_safe_l2_normalize():
    x = np.random.RandomState(2).randn(8, 3).astype(np.float32)
    got = np.asarray(m.safe_l2_normalize(jnp.array(x), axis=1))
    want = x / np.sqrt(np.maximum((x ** 2).sum(1, keepdims=True), 1e-6))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # Zero vector stays finite
    z = np.asarray(m.safe_l2_normalize(jnp.zeros((1, 3)), axis=1))
    assert np.isfinite(z).all()


def test_safe_cumprod_exclusive():
    x = np.array([[0.5, 0.25, 0.8, 0.1]], dtype=np.float32)
    got = np.asarray(m.safe_cumprod(jnp.array(x)))
    eps = 1e-6
    want = np.array([[1.0,
                      x[0, 0] + eps,
                      (x[0, 0] + eps) * (x[0, 1] + eps),
                      (x[0, 0] + eps) * (x[0, 1] + eps) * (x[0, 2] + eps)]])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_divide_no_nan():
    num = jnp.array([1.0, 2.0, 3.0])
    den = jnp.array([2.0, 0.0, 4.0])
    got = np.asarray(m.divide_no_nan(num, den))
    np.testing.assert_allclose(got, [0.5, 0.0, 0.75])
    # Gradient through 0-denominator is finite
    g = jax.grad(lambda n: m.divide_no_nan(n, jnp.array(0.0)))(1.0)
    assert np.isfinite(g)


def test_inv_transform_sample_det():
    # Deterministic sampling on a uniform pdf should return the linspace
    # mapped through the (linear) CDF support.
    val = jnp.array([[0.0, 1.0, 2.0, 3.0]], dtype=jnp.float32)
    weights = jnp.ones((1, 3), dtype=jnp.float32)
    out = np.asarray(m.inv_transform_sample(val, weights, 5, det=True))
    assert out.shape == (1, 5)
    assert (np.diff(out[0]) >= -1e-6).all()
    assert out[0, 0] >= 0.0 and out[0, -1] <= 3.0 + 1e-6

    # Concentrated weights pull samples toward that bin. The u=1.0
    # endpoint lands in the final zero-probability bin and maps to the
    # last bin edge -- same as the reference's denom-guard behavior
    # (util/math.py:84-93), so it is excluded here.
    weights = jnp.array([[0.0, 100.0, 0.0]], dtype=jnp.float32)
    out = np.asarray(m.inv_transform_sample(val, weights, 32, det=True))
    inner = out[0, :-1]
    assert (inner >= 1.0 - 1e-4).all() and (inner <= 2.0 + 1e-4).all()


def test_inv_transform_sample_random_in_support():
    key = jax.random.PRNGKey(0)
    val = jnp.linspace(2.0, 6.0, 63)[None, :].repeat(4, axis=0)
    weights = jax.random.uniform(key, (4, 62)) + 0.1
    out = np.asarray(m.inv_transform_sample(
        val, weights, 128, det=False, key=key))
    assert out.shape == (4, 128)
    assert (out >= 2.0 - 1e-5).all() and (out <= 6.0 + 1e-5).all()
