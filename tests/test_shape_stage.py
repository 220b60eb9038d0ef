"""End-to-end shape stage on the analytic sphere with exact buffers."""

import json
from os.path import join, exists

import numpy as np
import pytest

from tests import synth
from nerfactor_tpu.utils import io as ioutil


@pytest.fixture(scope='module')
def shape_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('shape_data'))
    outroot = str(tmp_path_factory.mktemp('shape_out'))
    synth.make_scene(root, n_train=4, n_vali=1, n_test=1, imh=16,
                     with_buffers=True, light_h=4)
    from nerfactor_tpu import trainvali
    override = ','.join([
        'data_root=%s' % root,
        'data_nerf_root=%s' % join(root, 'surf'),
        'outroot=%s' % outroot,
        'imh=16', 'light_h=4',
        'epochs=40', 'ckpt_period=20', 'vali_period=40', 'vali_batches=1',
        'n_rays_per_step=128',
        'mlp_width=32', 'mlp_depth=2', 'mlp_skip_at=1',
        'mlp_chunk=8192',
        'lr=1e-2',
    ])
    trainvali.main(['--config', 'shape.ini', '--config_override', override])
    return outroot


def test_shape_training(shape_run):
    outdir = join(shape_run, 'lr1e-2')
    with open(join(outdir, 'summary_train', 'scalars.jsonl')) as h:
        recs = [json.loads(line) for line in h]
    losses = [r['loss_train'] for r in recs if 'loss_train' in r]
    assert losses[-1] < losses[0], \
        "Shape loss did not decrease: %s" % losses
    assert exists(join(outdir, 'checkpoints', 'ckpt-40.npz'))
    # Validation artifacts
    import os
    epochs = sorted(os.listdir(join(outdir, 'vis_vali')))
    batch_dir = join(outdir, 'vis_vali', epochs[-1], 'batch000000000')
    for f in ('pred_normal.png', 'gt_normal.png', 'pred_lvis.png',
              'gt_lvis.png', 'pred-vs-gt_normal.apng', 'metadata.json'):
        assert exists(join(batch_dir, f)), "Missing %s" % f


def test_shape_normals_learned(shape_run):
    """The normal MLP should reproduce sphere normals on foreground."""
    import jax
    from nerfactor_tpu.models import get_model_class
    from nerfactor_tpu.utils import config as configutil
    from nerfactor_tpu.explore_brdf_space import restore_model
    outdir = join(shape_run, 'lr1e-2')
    parser = configutil.read_config(outdir + '.ini')
    config = configutil.Config(parser)
    model = get_model_class('shape')(config)
    params = restore_model(model, join(outdir, 'checkpoints', 'ckpt-40'))
    # Query at analytic sphere points
    rng = np.random.RandomState(0)
    pts = rng.randn(64, 3)
    pts = synth.SPHERE_R * pts / np.linalg.norm(pts, axis=1, keepdims=True)
    import jax.numpy as jnp
    pred = np.asarray(model.pred_normal_at(params, jnp.asarray(
        pts, jnp.float32)))
    pred = pred / np.linalg.norm(pred, axis=1, keepdims=True)
    true = pts / synth.SPHERE_R
    cos = np.sum(pred * true, axis=1)
    # 40 tiny epochs: just check clear positive correlation
    assert np.mean(cos) > 0.5, "Normals not learned: mean cos=%.3f" \
        % np.mean(cos)
    del jax
