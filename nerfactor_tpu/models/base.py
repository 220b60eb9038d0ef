"""Model contract for the functional (pytree-parameter) model zoo.

The reference couples parameters to Keras objects (models/base.py:25-143);
here a model is a *configuration* object whose parameters live in a plain
pytree, so the driver can jit/grad/shard pure functions of
(params, batch, key):

  model = Model(config)
  params = model.init_params(jax.random.PRNGKey(0))
  pred, gt, loss_kwargs, to_vis = model.apply(params, batch, mode, key=key)
  per_example = model.compute_loss(params, pred, gt, **loss_kwargs)

Host-side visualization (vis_batch / compile_batch_vis) operates on NumPy
arrays pulled from device, exactly mirroring the reference artifacts
(per-batch PNGs, pred-vs-gt flipbooks, consolidated HTML, videos).
"""

from nerfactor_tpu.models import losses as losses_mod
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="models/base")


class BaseModel:
    def __init__(self, config, debug=False):
        self.config = config
        self.debug = debug
        if debug:
            logger.warn("Model in debug mode; behavior may be different")
        self.wloss = losses_mod.init_wloss(config.get('loss'))

    @staticmethod
    def _validate_mode(mode):
        if mode not in ('train', 'vali', 'test'):
            raise ValueError(mode)

    # ------ pure functions of (params, batch[, key]) ------

    def init_params(self, key):
        raise NotImplementedError

    def apply(self, params, batch, mode='train', key=None, **kwargs):
        """Returns (pred, gt, loss_kwargs, to_vis)."""
        raise NotImplementedError

    def needs_dw_false_keys(self):
        """Top-level param keys whose fused chains are invoked inside
        the TRAINING forward with ``needs_dw=False`` (dW/db
        accumulation skipped in the backward). Correctness requires
        every such key to be a frozen (all-False) subtree of
        ``trainable_mask`` -- its weight gradients would be zeroed by
        the optimizer mask anyway. ``make_train_step`` asserts this
        coupling at step-construction time."""
        return frozenset()

    def compute_loss(self, params, pred, gt, **kwargs):
        """Returns per-example loss of shape (batch,)."""
        raise NotImplementedError

    # ------ host-side ------

    def vis_batch(self, data_dict, outdir, mode='train', **kwargs):
        raise NotImplementedError

    def compile_batch_vis(self, batch_vis_dirs, outpref, mode='train',
                          **kwargs):
        raise NotImplementedError
