"""Device-side multi-step training (lax.scan) must match the same
number of sequential single-step dispatches exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfactor_tpu.parallel.train import (
    build_optimizer, make_train_step, make_train_step_scan)
from nerfactor_tpu.utils import config as configutil


class ToyModel:
    """Minimal BaseModel-contract model: y = x @ w, L2 loss."""

    def __init__(self):
        parser = configutil.read_config(
            configutil.resolve_config_path('brdf.ini'))
        configutil.apply_override(parser, 'lr=1e-2,lr_decay_steps=-1')
        self.config = configutil.Config(parser)

    def init_params(self, key):
        return {'w': jax.random.normal(key, (4, 2))}

    def apply(self, params, batch, mode='train', key=None):
        del mode
        noise = 0.01 * jax.random.normal(key, (1,)) if key is not None \
            else 0.0
        pred = {'y': batch['x'] @ params['w'] + noise}
        return pred, {'y': batch['y']}, {}, {}

    def compute_loss(self, params, pred, gt):
        return jnp.mean(jnp.square(pred['y'] - gt['y']), axis=-1)


def test_scan_matches_sequential():
    model = ToyModel()
    params = model.init_params(jax.random.PRNGKey(0))
    opt = build_optimizer(model.config)
    opt_state = opt.init(params)
    k_steps = 5
    rng = np.random.RandomState(0)
    w_true = rng.randn(4, 2).astype(np.float32)
    x = rng.randn(k_steps, 16, 4).astype(np.float32)
    stacked = {'x': jnp.asarray(x), 'y': jnp.asarray(x @ w_true)}
    base_key = jax.random.PRNGKey(3)

    # Sequential reference with the same per-step key derivation
    step1 = make_train_step(model, opt)
    p_seq = jax.tree_util.tree_map(jnp.array, params)
    o_seq = opt.init(p_seq)
    losses_seq = []
    for i in range(k_steps):
        batch_i = {k: v[i] for k, v in stacked.items()}
        p_seq, o_seq, loss = step1(
            p_seq, o_seq, batch_i, jax.random.fold_in(base_key, i))
        losses_seq.append(float(loss))

    stepk = make_train_step_scan(model, opt, n_steps=k_steps)
    p_scan = jax.tree_util.tree_map(jnp.array, params)
    o_scan = opt.init(p_scan)
    p_scan, o_scan, losses = stepk(p_scan, o_scan, stacked, base_key)
    np.testing.assert_allclose(np.asarray(losses), losses_seq, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_scan['w']),
                               np.asarray(p_seq['w']), rtol=1e-5,
                               atol=1e-7)
    # And training actually progresses
    assert losses_seq[-1] < losses_seq[0]
