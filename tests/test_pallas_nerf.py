"""Fused NeRF kernel (ops/pallas_nerf.py) vs the pure-JAX oracle,
through the Pallas interpreter on CPU: forward values, weight
gradients, and agreement with models/nerf.py's eval_nerf_at."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfactor_tpu.ops import pallas_mlp as pm
from nerfactor_tpu.ops import pallas_nerf as pn


@pytest.fixture(autouse=True, params=[True, False],
                ids=['ladder', 'stash'])
def interpret_mode(request):
    pm.INTERPRET = True
    old = pm.KERNEL_MATMUL_DTYPE
    old_l = pm.TRIG_LADDER
    pm.KERNEL_MATMUL_DTYPE = None
    pm.TRIG_LADDER = request.param
    yield
    pm.INTERPRET = False
    pm.KERNEL_MATMUL_DTYPE = old
    pm.TRIG_LADDER = old_l


PLANS = [
    # tiny nerf.ini-shaped net: posenc both, skip mid-trunk
    pn.make_nerf_plan(4, 2, 16, 4, 2, 'relu', (8, 3), ('relu', None)),
    # no view posenc (raw view dirs)
    pn.make_nerf_plan(3, 0, 16, 3, 1, 'relu', (8, 3), ('relu', None)),
]


def make_params(nplan, seed=0, scale=0.3):
    rng = np.random.RandomState(seed)
    tp = nplan.trunk_plan

    def dense(din, dout):
        return (jnp.asarray(rng.randn(din, dout) * scale, jnp.float32),
                jnp.asarray(rng.randn(dout) * 0.05, jnp.float32))

    dims = pm.layer_in_dims(tp)
    trunk = [dense(dims[i], w) for i, w in enumerate(tp.widths)]
    feat = pm.out_dim(tp)
    width = tp.widths[-1]
    sigma = [dense(feat, 1)]
    bott = [dense(feat, width)]
    ev_dim = 3 + 6 * nplan.n_freqs_view
    rgb = [dense(width + ev_dim, nplan.rgb_widths[0]),
           dense(nplan.rgb_widths[0], nplan.rgb_widths[1])]
    return (trunk, sigma, bott, rgb)


def rand_dirs(rng, n):
    d = rng.randn(n, 3).astype(np.float32)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


@pytest.mark.parametrize('nplan', PLANS)
@pytest.mark.parametrize('n', [64, 100])  # 100 exercises col padding
def test_forward_matches_reference(nplan, n):
    params = make_params(nplan)
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(n, 3), jnp.float32)
    views = jnp.asarray(rand_dirs(rng, n))
    rgb_r, sigma_r = pn.nerf_reference(nplan, pts, views, params)
    rgb_k, sigma_k = pn._nerf_fused(nplan, 'default', pts, views, params)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma_k), np.asarray(sigma_r),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('nplan', PLANS)
def test_weight_gradients_match_reference(nplan):
    params = make_params(nplan, seed=3)
    rng = np.random.RandomState(4)
    n = 70
    pts = jnp.asarray(rng.randn(n, 3), jnp.float32)
    views = jnp.asarray(rand_dirs(rng, n))
    co_rgb = jnp.asarray(rng.randn(n, 3), jnp.float32)
    co_sigma = jnp.asarray(rng.randn(n, 1), jnp.float32)

    def loss(fn):
        def f(p_):
            rgb, sigma = fn(nplan, pts, views, p_)
            return jnp.sum(rgb * co_rgb) + jnp.sum(sigma * co_sigma)
        return f

    g_r = jax.grad(loss(pn.nerf_reference))(params)
    g_k = jax.grad(loss(
        lambda np_, p, v, par: pn._nerf_fused(np_, 'default', p, v,
                                              par)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_r),
                    jax.tree_util.tree_leaves(g_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_reference_matches_model_eval():
    """pn.nerf_reference == models/nerf.py eval_nerf_at (use_views)."""
    from nerfactor_tpu.models import get_model_class
    from nerfactor_tpu.utils import config as configutil
    parser = configutil.read_config(
        configutil.resolve_config_path('nerf.ini'))
    configutil.apply_override(
        parser, 'near=2,far=6,mlp_width=16,enc_depth=4,'
        'n_freqs_xyz=4,n_freqs_view=2,bf16_big_chains=False')
    model = get_model_class('nerf')(configutil.Config(parser))
    params = model.init_params(jax.random.PRNGKey(0))
    nplan = pn.make_nerf_plan(4, 2, 16, 4, 2, 'relu', (8, 3),
                              ('relu', None))
    rng = np.random.RandomState(5)
    pts = rng.randn(4, 6, 3).astype(np.float32)
    views = np.broadcast_to(
        rand_dirs(rng, 4)[:, None, :], pts.shape).copy()
    via_model = model.eval_nerf_at(
        params, jnp.asarray(pts), jnp.asarray(views))
    p = ([(l['w'], l['b']) for l in params['coarse_enc']],
         [(params['coarse_sigma_out'][0]['w'],
           params['coarse_sigma_out'][0]['b'])],
         [(params['coarse_bottleneck'][0]['w'],
           params['coarse_bottleneck'][0]['b'])],
         [(l['w'], l['b']) for l in params['coarse_rgb_out']])
    rgb, sigma = pn.nerf_reference(
        nplan, jnp.asarray(pts.reshape(-1, 3)),
        jnp.asarray(views.reshape(-1, 3)), p)
    rgbs = jnp.concatenate([rgb, sigma], axis=1).reshape(4, 6, 4)
    np.testing.assert_allclose(np.asarray(rgbs), np.asarray(via_model),
                               rtol=1e-5, atol=1e-5)


def test_model_fused_flag_consistency():
    """The NeRF model with fused_mlp=True (kernel via interpreter on
    CPU) renders the same rays as with fused_mlp=False, and eval_sigma's
    fused chain matches, values and spatial gradients."""
    from nerfactor_tpu.models import get_model_class
    from nerfactor_tpu.utils import config as configutil

    def build(fused):
        parser = configutil.read_config(
            configutil.resolve_config_path('nerf.ini'))
        configutil.apply_override(
            parser, 'near=2,far=6,mlp_width=16,enc_depth=4,'
            'n_samples_coarse=8,n_samples_fine=8,'
            'n_freqs_xyz=4,n_freqs_view=2,bf16_big_chains=False,'
            'fused_mlp=%s' % fused)
        return get_model_class('nerf')(configutil.Config(parser))

    m0, m1 = build(False), build(True)
    params = m0.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(6)
    rayo = np.tile(np.asarray([[0, 0, 4]], np.float32), (10, 1))
    rayd = rand_dirs(rng, 10)
    key = jax.random.PRNGKey(1)
    (c0, f0) = m0.render_rays(params, jnp.asarray(rayo),
                              jnp.asarray(rayd), mode='vali', key=key)
    (c1, f1) = m1.render_rays(params, jnp.asarray(rayo),
                              jnp.asarray(rayd), mode='vali', key=key)
    for a, b in zip(jax.tree_util.tree_leaves((c0, f0)),
                    jax.tree_util.tree_leaves((c1, f1))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
    # eval_sigma: values + gradient w.r.t. points (the normal pass)
    pts = jnp.asarray(rng.randn(33, 3), jnp.float32)

    def sig_sum(model):
        return lambda p_: jnp.sum(model.eval_sigma(params, p_))

    s0 = m0.eval_sigma(params, pts)
    s1 = m1.eval_sigma(params, pts)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-4, atol=1e-5)
    g0 = jax.grad(sig_sum(m0))(pts)
    g1 = jax.grad(sig_sum(m1))(pts)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-4)
