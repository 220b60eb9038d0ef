"""Tests for the MLP stack, loss parsing, and checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfactor_tpu.models import networks, losses
from nerfactor_tpu.utils import ckpt as ckptlib


def test_mlp_shapes_and_skip():
    key = jax.random.PRNGKey(0)
    spec = networks.MLPSpec(18, [128] * 4, acts='relu', skip_at=[2])
    params = spec.init(key)
    # fan-ins: 18, 128, 128 (+18 skip after layer 2), ...
    assert params[0]['w'].shape == (18, 128)
    assert params[1]['w'].shape == (128, 128)
    assert params[2]['w'].shape == (128, 128)
    assert params[3]['w'].shape == (128 + 18, 128)
    x = jnp.ones((7, 18))
    y = spec.apply(params, x)
    assert y.shape == (7, 128)
    assert np.isfinite(np.asarray(y)).all()


def test_mlp_activations():
    key = jax.random.PRNGKey(1)
    spec = networks.MLPSpec(4, [8, 1], acts=['relu', 'sigmoid'])
    params = spec.init(key)
    y = np.asarray(spec.apply(params, jnp.ones((5, 4))))
    assert (y > 0).all() and (y < 1).all()


def test_latent_code():
    key = jax.random.PRNGKey(2)
    z = networks.init_latent_code(key, 10, 3, mean=0.0, std=0.01)
    assert z.shape == (10, 3)
    assert np.abs(np.asarray(z)).max() < 0.1
    looked = networks.latent_code_lookup(z, jnp.array([1, 3]))
    np.testing.assert_allclose(np.asarray(looked), np.asarray(z)[[1, 3]])
    interp = networks.latent_code_interp(z, 0.25, 0, 0.75, 1)
    want = 0.25 * np.asarray(z)[0] + 0.75 * np.asarray(z)[1]
    np.testing.assert_allclose(np.asarray(interp)[0], want, rtol=1e-5)
    # slerp on normalized codes keeps unit norm
    interp_n = networks.latent_code_interp(z, 0.5, 0, 0.5, 1, normalize=True)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(interp_n)), 1.0,
                               atol=1e-4)


def test_loss_parsing():
    assert losses.parse_loss_and_weight('l2') == ('l2', 1.0)
    assert losses.parse_loss_and_weight('1e+2lpips') == ('lpips', 100.0)
    assert losses.parse_loss_and_weight('10l1') == ('l1', 10.0)
    wloss = losses.init_wloss('l2,0.5l1')
    assert len(wloss) == 2
    assert wloss[0][0] == 1.0 and wloss[1][0] == 0.5


def test_l2_keep_batch():
    gt = jnp.zeros((4, 3))
    pred = jnp.ones((4, 3)) * jnp.arange(1, 5)[:, None]
    per_ex = np.asarray(losses.l2(gt, pred, keep_batch=True))
    np.testing.assert_allclose(per_ex, np.arange(1, 5) ** 2, rtol=1e-6)
    total = float(losses.l2(gt, pred))
    np.testing.assert_allclose(total, np.mean(np.arange(1, 5) ** 2),
                               rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    tree = {'a': jnp.arange(6).reshape(2, 3).astype(jnp.float32),
            'b': [jnp.zeros((4,)), {'c': jnp.ones((1,))}]}
    mgr = ckptlib.CheckpointManager(str(tmp_path / 'ckpts'), max_to_keep=2)
    for step in (1, 2, 3):
        mutated = jax.tree_util.tree_map(lambda x: x + step, tree)
        mgr.save(step, mutated)
    # max_to_keep evicted ckpt-1
    assert mgr.latest_step() == 3
    assert mgr.restore(tree, step=3) is not None
    restored = mgr.restore(tree)
    np.testing.assert_allclose(np.asarray(restored['a']),
                               np.arange(6).reshape(2, 3) + 3)
    # ckpt path convention
    assert mgr.latest_checkpoint.endswith('ckpt-3')
