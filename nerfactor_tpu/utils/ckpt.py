"""Checkpointing with the reference's epoch semantics.

Contract parity (trainvali.py:134-146, util/io.py:36-45):
  * checkpoints live under <outdir>/checkpoints/ named ``ckpt-N`` where N
    indexes *epochs*;
  * ``max_to_keep`` evicts old epochs;
  * restore-for-inference takes a ckpt path prefix (``.../ckpt-10``).

State is a pytree of jnp/np arrays, stored as a single .npz whose keys are
flatten-order indices; restore rebuilds against a template pytree from the
model, so no pickled treedefs are involved.
"""

import os
import re

import jax
import numpy as np

from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="utils/ckpt")


def save_pytree(pytree, path_prefix):
    leaves = jax.tree_util.tree_leaves(pytree)
    arrays = {('leaf_%06d' % i): np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(path_prefix), exist_ok=True)
    tmp = path_prefix + '.tmp.npz'
    with open(tmp, 'wb') as h:
        np.savez(h, **arrays)
    os.replace(tmp, path_prefix + '.npz')


def restore_pytree(template, path_prefix):
    """Loads arrays saved by :func:`save_pytree` into the structure of
    ``template``. Shapes must match."""
    path = path_prefix if path_prefix.endswith('.npz') \
        else path_prefix + '.npz'
    with open(path, 'rb') as h:
        data = np.load(h)
        arrays = [data['leaf_%06d' % i] for i in range(len(data.files))]
    leaves, treedef = jax.tree_util.tree_flatten(template)
    assert len(leaves) == len(arrays), (
        "Checkpoint has %d leaves but template has %d"
        % (len(arrays), len(leaves)))
    for i, (l, a) in enumerate(zip(leaves, arrays)):
        assert tuple(np.shape(l)) == tuple(a.shape), (
            "Leaf %d shape mismatch: template %s vs checkpoint %s"
            % (i, np.shape(l), a.shape))
    return jax.tree_util.tree_unflatten(treedef, arrays)


def restore_trained_params(ckpt_path, template_params, config):
    """Restores just the model parameters from a trainvali checkpoint
    (which stores {'params', 'opt_state'}).

    The checkpoint is flattened in dict-key order, so 'opt_state' leaves
    precede 'params' leaves; the params are always the TRAILING
    len(tree_leaves(template_params)) arrays. Slicing from the tail
    (instead of reconstructing the optimizer-state template from config)
    keeps old checkpoints restorable across optimizer-state layout
    changes -- only the params structure must match.

    This is how one model composes another's training result at
    construction time (reference nerfactor.py:59, 156-158)."""
    del config  # kept for call-site compatibility
    path = ckpt_path if ckpt_path.endswith('.npz') else ckpt_path + '.npz'
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with open(path, 'rb') as h:
        data = np.load(h)
        arrays = [data['leaf_%06d' % i] for i in range(len(data.files))]
    leaves, treedef = jax.tree_util.tree_flatten(template_params)
    assert len(arrays) >= len(leaves), (
        "Checkpoint has %d leaves but the params template alone has %d"
        % (len(arrays), len(leaves)))
    tail = arrays[len(arrays) - len(leaves):]
    for i, (l, a) in enumerate(zip(leaves, tail)):
        assert tuple(np.shape(l)) == tuple(a.shape), (
            "Params leaf %d shape mismatch: template %s vs checkpoint %s"
            % (i, np.shape(l), a.shape))
    return jax.tree_util.tree_unflatten(treedef, tail)


class CheckpointManager:
    def __init__(self, ckptdir, max_to_keep=None):
        self.ckptdir = ckptdir
        self.max_to_keep = max_to_keep
        os.makedirs(ckptdir, exist_ok=True)

    def _steps(self):
        steps = []
        for f in os.listdir(self.ckptdir):
            m = re.fullmatch(r'ckpt-(\d+)\.npz', f)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    @property
    def latest_checkpoint(self):
        steps = self._steps()
        if not steps:
            return None
        return os.path.join(self.ckptdir, 'ckpt-%d' % steps[-1])

    def latest_step(self):
        steps = self._steps()
        return steps[-1] if steps else 0

    def save(self, step, pytree):
        prefix = os.path.join(self.ckptdir, 'ckpt-%d' % step)
        save_pytree(pytree, prefix)
        if self.max_to_keep is not None and self.max_to_keep > 0:
            for s in self._steps()[:-self.max_to_keep]:
                os.remove(os.path.join(self.ckptdir, 'ckpt-%d.npz' % s))
        return prefix

    def restore(self, template, step=None):
        prefix = self.latest_checkpoint if step is None else \
            os.path.join(self.ckptdir, 'ckpt-%d' % step)
        if prefix is None:
            return None
        return restore_pytree(template, prefix)
