"""LPIPS network (models/perceptual.py): architecture, invariances, and
the torch-checkpoint loader (exercised against SYNTHESIZED state dicts
in both accepted layouts -- real pretrained weights don't exist in this
environment, PARITY.md "Known gaps", so these tests pin the plumbing
that activates the moment they do)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerfactor_tpu.models import perceptual


@pytest.fixture(scope='module')
def params():
    return perceptual.init_random_params(jax.random.PRNGKey(0))


def _imgs(n=2, h=35, w=33, seed=1):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, h, w, 3).astype(np.float32),
            rng.rand(n, h, w, 3).astype(np.float32))


def test_forward_shapes_and_identity(params):
    im0, im1 = _imgs()
    d = np.asarray(perceptual.lpips(params, im0, im1))
    assert d.shape == (2,)
    assert np.all(d >= 0) and np.all(np.isfinite(d))
    # Identical images -> exactly zero (normalized-feature difference
    # vanishes before the linear heads)
    np.testing.assert_array_equal(
        np.asarray(perceptual.lpips(params, im0, im0)), 0.0)


def test_symmetry_and_sensitivity(params):
    im0, im1 = _imgs(seed=2)
    d01 = np.asarray(perceptual.lpips(params, im0, im1))
    d10 = np.asarray(perceptual.lpips(params, im1, im0))
    np.testing.assert_allclose(d01, d10, rtol=1e-5, atol=1e-7)
    # A perturbed copy scores strictly between identical and unrelated
    d_near = np.asarray(perceptual.lpips(
        params, im0, np.clip(im0 + 0.01, 0, 1)))
    assert np.all(d_near > 0) and np.all(d_near < d01)


def test_jit_and_grad(params):
    """The loss path must be jittable and differentiable w.r.t. pred
    (it joins the registry's training losses)."""
    im0, im1 = _imgs(n=1, seed=3)

    @jax.jit
    def loss(pred):
        return jnp.mean(perceptual.lpips(params, jnp.asarray(im0), pred))

    g = jax.grad(loss)(jnp.asarray(im1))
    assert g.shape == im1.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0


def _fake_alex_state(rng, prefix_slices):
    """Synthesizes a state dict shaped exactly like the real
    checkpoints: full-LPIPS ('net.sliceK.J.*' + linK) or torchvision
    alexnet ('features.J.*')."""
    import torch
    state = {}
    tv_idx = (0, 3, 6, 8, 10)
    slice_of = ((1, 0), (2, 3), (3, 6), (4, 8), (5, 10))
    in_ch = 3
    for i, (out_ch, k, _s, _p) in enumerate(perceptual._ALEX_CONVS):
        w = rng.randn(out_ch, in_ch, k, k).astype(np.float32) * 0.05
        b = rng.randn(out_ch).astype(np.float32) * 0.01
        if prefix_slices:
            sk, sj = slice_of[i]
            state['net.slice%d.%d.weight' % (sk, sj)] = torch.tensor(w)
            state['net.slice%d.%d.bias' % (sk, sj)] = torch.tensor(b)
        else:
            state['features.%d.weight' % tv_idx[i]] = torch.tensor(w)
            state['features.%d.bias' % tv_idx[i]] = torch.tensor(b)
        in_ch = out_ch
    lins = {}
    for i, c in enumerate(perceptual._TAP_CHANNELS):
        lin = np.abs(rng.randn(1, c, 1, 1)).astype(np.float32)
        lins['lin%d.model.1.weight' % i] = torch.tensor(lin)
    return state, lins


@pytest.mark.parametrize('layout', ['full_lpips', 'tv_plus_lin'])
def test_torch_loader_both_layouts(tmp_path, layout):
    torch = pytest.importorskip('torch')
    rng = np.random.RandomState(0)
    state, lins = _fake_alex_state(rng, prefix_slices=(
        layout == 'full_lpips'))
    if layout == 'full_lpips':
        state.update(lins)
        path = str(tmp_path / 'lpips_alex.pth')
        torch.save(state, path)
        params = perceptual.load_torch_weights(path)
    else:
        path = str(tmp_path / 'alexnet.pth')
        lin_path = str(tmp_path / 'alex_lin.pth')
        torch.save(state, path)
        torch.save(lins, lin_path)
        params = perceptual.load_torch_weights(path, lin_path=lin_path)
    # Shapes: HWIO convs matching the architecture table, 5 lin vectors
    for (w, b), (out_ch, k, _s, _p), in_ch in zip(
            params['convs'], perceptual._ALEX_CONVS,
            (3,) + perceptual._TAP_CHANNELS[:-1]):
        assert w.shape == (k, k, in_ch, out_ch)
        assert b.shape == (out_ch,)
    for lin, c in zip(params['lins'], perceptual._TAP_CHANNELS):
        assert lin.shape == (c,)
    # And the network runs with the loaded weights
    im0, im1 = _imgs(n=1, h=32, w=32)
    d = np.asarray(perceptual.lpips(params, im0, im1))
    assert d.shape == (1,) and np.isfinite(d[0]) and d[0] >= 0


def test_loss_registry_gates_without_weights(monkeypatch):
    """'lpips' in a loss config stays gated with the explanatory error
    until weights are configured; with (fake) weights it activates."""
    from nerfactor_tpu.models import losses
    monkeypatch.setattr(perceptual, '_cached', None)
    monkeypatch.delenv(perceptual._WEIGHTS_ENV, raising=False)
    with pytest.raises(NotImplementedError, match='perceptual weights'):
        losses.get_loss_fn('lpips')
    fake = perceptual.init_random_params(jax.random.PRNGKey(1))
    monkeypatch.setattr(perceptual, 'get_params_or_none', lambda: fake)
    fn = losses.get_loss_fn('lpips')
    im0, im1 = _imgs(n=2, h=32, w=32, seed=5)
    scalar = fn(im0, im1)
    per_im = fn(im0, im1, keep_batch=True)
    assert np.asarray(per_im).shape == (2,)
    np.testing.assert_allclose(
        float(scalar), float(np.mean(np.asarray(per_im))), rtol=1e-6)


def test_metric_wrapper(monkeypatch):
    """utils.metrics.lpips mirrors the reference metric contract:
    dtype-implied drange, grayscale -> RGB stacking."""
    from nerfactor_tpu.utils import metrics
    fake = perceptual.init_random_params(jax.random.PRNGKey(2))
    rng = np.random.RandomState(3)
    im1 = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    im2 = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    d = metrics.lpips(im1, im2, drange='uint8', params=fake)
    assert np.isfinite(d) and d >= 0
    assert metrics.lpips(im1, im1, drange='uint8', params=fake) == 0.0
    # Grayscale inputs are stacked to RGB, scaled by the float drange
    g1, g2 = rng.rand(32, 32), rng.rand(32, 32)
    d_gray = metrics.lpips(g1, g2, drange='float', params=fake)
    assert np.isfinite(d_gray) and d_gray >= 0
    # Gated without params/env
    monkeypatch.setattr(perceptual, '_cached', None)
    monkeypatch.delenv(perceptual._WEIGHTS_ENV, raising=False)
    with pytest.raises(NotImplementedError):
        metrics.lpips(im1, im2)


def test_elpips_ensemble(params):
    """E-LPIPS: transformation-invariance of the ensemble structure —
    identical images stay at exactly zero under every draw, the value
    is finite/positive for distinct images, deterministic per key, and
    jit/grad-capable. Non-square inputs skip the transpose draw."""
    im0, im1 = _imgs(n=2, h=44, w=40, seed=7)
    key = jax.random.PRNGKey(0)
    d = np.asarray(perceptual.elpips(params, im0, im1, key, n_draws=4))
    assert d.shape == (2,)
    assert np.all(d > 0) and np.all(np.isfinite(d))
    np.testing.assert_array_equal(np.asarray(
        perceptual.elpips(params, im0, im0, key, n_draws=4)), 0.0)
    # Same key -> same ensemble -> identical value; different key differs
    d2 = np.asarray(perceptual.elpips(params, im0, im1, key, n_draws=4))
    np.testing.assert_array_equal(d, d2)
    d3 = np.asarray(perceptual.elpips(
        params, im0, im1, jax.random.PRNGKey(1), n_draws=4))
    assert not np.array_equal(d, d3)
    # Square images exercise the transpose branch too, under jit + grad
    s0, s1 = _imgs(n=1, h=40, w=40, seed=8)

    @jax.jit
    def loss(pred):
        return jnp.mean(perceptual.elpips(
            params, jnp.asarray(s0), pred, jax.random.PRNGKey(2),
            n_draws=2))

    g = jax.grad(loss)(jnp.asarray(s1))
    assert g.shape == s1.shape and bool(jnp.all(jnp.isfinite(g)))


def test_elpips_registry(monkeypatch):
    from nerfactor_tpu.models import losses
    fake = perceptual.init_random_params(jax.random.PRNGKey(3))
    monkeypatch.setattr(perceptual, 'get_params_or_none', lambda: fake)
    fn = losses.get_loss_fn('elpips')
    im0, im1 = _imgs(n=2, h=40, w=40, seed=9)
    per_im = fn(im0, im1, keep_batch=True)
    assert np.asarray(per_im).shape == (2,)
    assert float(fn(im0, im1)) > 0
    monkeypatch.setattr(perceptual, '_cached', None)
    monkeypatch.setattr(perceptual, 'get_params_or_none',
                        lambda: None)
    with pytest.raises(NotImplementedError, match='perceptual weights'):
        losses.get_loss_fn('elpips')
