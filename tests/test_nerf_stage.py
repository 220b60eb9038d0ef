"""End-to-end NeRF stage: synthetic sphere scene -> short training ->
loss decreases; vis artifacts appear; test rendering runs."""

import json
import os
from os.path import join, exists

import pytest

from tests import synth


@pytest.fixture(scope='module')
def nerf_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('nerf_data'))
    outroot = str(tmp_path_factory.mktemp('nerf_out'))
    synth.make_scene(root, n_train=3, n_vali=1, n_test=1, imh=16)
    from nerfactor_tpu import trainvali
    override = ','.join([
        'data_root=%s' % root,
        'outroot=%s' % outroot,
        'imh=16',
        'near=2', 'far=6',
        'epochs=20', 'ckpt_period=10', 'vali_period=20', 'vali_batches=1',
        'n_rays_per_step=128',
        'n_samples_coarse=16', 'n_samples_fine=16',
        'mlp_width=32', 'enc_depth=4',
        'mlp_chunk=4096',
        'lr=5e-4',
    ])
    trainvali.main(['--config', 'nerf.ini', '--config_override', override])
    return outroot


def test_nerf_training(nerf_run):
    outdir = join(nerf_run, 'lr5e-4')
    with open(join(outdir, 'summary_train', 'scalars.jsonl')) as h:
        recs = [json.loads(line) for line in h]
    losses = [r['loss_train'] for r in recs if 'loss_train' in r]
    assert len(losses) >= 2
    assert losses[-1] < losses[0], "NeRF loss did not decrease: %s" % losses
    assert exists(join(outdir, 'checkpoints', 'ckpt-20.npz'))
    # Validation artifacts: full-image buffers + flipbooks + PSNR metadata
    epochs = sorted(os.listdir(join(outdir, 'vis_vali')))
    batch_dir = join(outdir, 'vis_vali', epochs[-1], 'batch000000000')
    for f in ('gt_rgb.png', 'fine_rgb.png', 'coarse_rgb.png',
              'fine_depth.png', 'fine-vs-gt_rgb.apng', 'metadata.json'):
        assert exists(join(batch_dir, f)), "Missing %s" % f
    metadata = json.load(open(join(batch_dir, 'metadata.json')))
    assert 'psnr' in metadata and metadata['psnr'] > 5


def test_tensorboard_event_files(nerf_run):
    """Real TB event files are written alongside the JSONL (reference
    trainvali.py:149-152 ecosystem parity; TF is importable here)."""
    import glob
    outdir = join(nerf_run, 'lr5e-4')
    for sub in ('summary_train', 'summary_vali'):
        events = glob.glob(join(outdir, sub, 'events.out.tfevents.*'))
        assert events, 'no TB event file in %s' % sub
    # The train events actually carry the loss scalar
    from tensorflow.python.summary.summary_iterator import (
        summary_iterator)
    tags = set()
    for path in glob.glob(join(outdir, 'summary_train',
                               'events.out.tfevents.*')):
        for ev in summary_iterator(path):
            for v in ev.summary.value:
                tags.add(v.tag)
    assert 'loss_train' in tags, tags


def test_nerf_test_rendering(nerf_run):
    outdir = join(nerf_run, 'lr5e-4')
    from nerfactor_tpu import nerf_test
    nerf_test.main(['--ckpt', join(outdir, 'checkpoints', 'ckpt-20')])
    vis_test = join(outdir, 'vis_test', 'ckpt-20')
    assert exists(join(vis_test, 'batch000000000', 'fine_rgb.png'))
    assert exists(join(vis_test, 'batch000000000', 'metadata.json'))


def test_nerf_bf16_chains_trains(tmp_path):
    """bf16 sample-scale MLP evals: short training stays finite and
    makes progress (the TPU perf configuration; eval_sigma used by
    geometry distillation remains f32 by construction)."""
    root = str(tmp_path / 'data')
    outroot = str(tmp_path / 'out')
    synth.make_scene(root, n_train=3, n_vali=1, n_test=1, imh=16)
    from nerfactor_tpu import trainvali
    override = ','.join([
        'data_root=%s' % root, 'outroot=%s' % outroot,
        'imh=16', 'near=2', 'far=6',
        'epochs=10', 'ckpt_period=10', 'vali_period=10', 'vali_batches=1',
        'n_rays_per_step=128', 'n_samples_coarse=16', 'n_samples_fine=16',
        'mlp_width=32', 'enc_depth=4', 'mlp_chunk=4096',
        'bf16_big_chains=True', 'lr=5e-4'])
    trainvali.main(['--config', 'nerf.ini', '--config_override', override])
    import numpy as np
    with open(join(outroot, 'lr5e-4', 'summary_train',
                   'scalars.jsonl')) as h:
        recs = [json.loads(line) for line in h]
    losses = [r['loss_train'] for r in recs if 'loss_train' in r]
    assert losses and np.isfinite(losses).all()
