"""Data-parallel consistency: the jitted train step must produce the
same result whether the batch lives on 1 device or is sharded over all 8
virtual CPU devices (XLA inserts the psum; the math is the global-batch
mean either way)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfactor_tpu.parallel import mesh as meshlib
from nerfactor_tpu.parallel.train import build_optimizer, make_train_step
from nerfactor_tpu.utils import config as configutil


def _tiny_shape_model(tmp_path):
    from tests import synth
    from nerfactor_tpu.models.shape import Model as ShapeModel
    root = str(tmp_path / 'scene')
    synth.make_scene(root, n_train=2, n_vali=1, n_test=1, imh=8,
                     with_buffers=True, light_h=2)
    parser = configutil.read_config(
        configutil.resolve_config_path('shape.ini'))
    configutil.apply_override(parser, ','.join([
        'data_root=%s' % root, 'data_nerf_root=%s/surf' % root,
        'imh=8', 'light_h=2', 'n_rays_per_step=64',
        'mlp_width=16', 'mlp_depth=2', 'mlp_skip_at=1',
        # f32 chains: bf16 rounding makes cross-device reduction order
        # visible above the tight tolerance this test asserts
        'bf16_big_chains=False',
        'mlp_chunk=1024']))
    return ShapeModel(configutil.Config(parser))


def test_sharded_step_matches_single_device(tmp_path):
    assert jax.device_count() >= 8, "conftest should give 8 CPU devices"
    model = _tiny_shape_model(tmp_path)
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = build_optimizer(model.config)
    opt_state = optimizer.init(params)
    train_step = make_train_step(model, optimizer)

    rng = np.random.RandomState(0)
    n = 64
    xyz = rng.randn(n, 3).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=1, keepdims=True)
    batch = {
        'rayo': 4 * np.abs(rng.randn(n, 3)).astype(np.float32),
        'rayd': np.zeros((n, 3), np.float32),
        'rgb': rng.rand(n, 3).astype(np.float32),
        'alpha': np.ones((n, 1), np.float32),
        'xyz': xyz, 'normal': xyz,
        'lvis': rng.rand(n, model.n_lights).astype(np.float32),
    }
    key = jax.random.PRNGKey(7)

    results = {}
    for tag, devices in (('one', jax.devices()[:1]),
                         ('all', jax.devices())):
        dmesh = meshlib.make_mesh(devices)
        # Fresh copies: the train step donates its params/opt_state
        copy = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.array(np.asarray(x)), t)
        p = meshlib.replicate(copy(params), dmesh)
        o = meshlib.replicate(copy(opt_state), dmesh)
        arrays = meshlib.shard_batch(batch, dmesh)
        for _ in range(3):
            p, o, loss = train_step(p, o, arrays, key)
        results[tag] = (jax.device_get(p), float(loss))

    assert np.isclose(results['one'][1], results['all'][1], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(results['one'][0]),
                    jax.tree_util.tree_leaves(results['all'][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_shard_batch_layout():
    dmesh = meshlib.make_mesh()
    arrays = {'a': np.arange(64, dtype=np.float32).reshape(64, 1),
              'odd': np.arange(7, dtype=np.float32)}  # not divisible
    sharded = meshlib.shard_batch(arrays, dmesh)
    # Divisible leading axis -> sharded over 8 devices
    assert len(sharded['a'].sharding.device_set) == 8
    # Indivisible -> replicated, values intact
    np.testing.assert_array_equal(np.asarray(sharded['odd']),
                                  arrays['odd'])
