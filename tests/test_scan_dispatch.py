"""scan_steps multi-step dispatch through the full trainvali driver:
grouped+stacked batches must train equivalently to single-step
dispatch (same scene, same epochs) on the 8-device CPU mesh."""

import json
from os.path import join, exists

import numpy as np
import pytest

from tests import synth


@pytest.fixture(scope='module')
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('scan_data'))
    synth.make_scene(root, n_train=4, n_vali=1, n_test=1, imh=16,
                     with_buffers=True, light_h=4)
    return root


def _run(root, outroot, scan_steps):
    from nerfactor_tpu import trainvali
    override = ','.join([
        'data_root=%s' % root,
        'data_nerf_root=%s' % join(root, 'surf'),
        'outroot=%s' % outroot,
        'imh=16', 'light_h=4',
        'epochs=20', 'ckpt_period=10', 'vali_period=21',
        'vali_batches=1', 'n_rays_per_step=128',
        'mlp_width=32', 'mlp_depth=2', 'mlp_skip_at=1',
        'mlp_chunk=8192', 'lr=1e-2',
        'scan_steps=%d' % scan_steps,
    ])
    trainvali.main(['--config', 'shape.ini',
                    '--config_override', override])
    outdir = join(outroot, 'lr1e-2')
    with open(join(outdir, 'summary_train', 'scalars.jsonl')) as h:
        recs = [json.loads(line) for line in h]
    return outdir, [r['loss_train'] for r in recs if 'loss_train' in r]


def test_scan_dispatch_trains(scene, tmp_path_factory):
    """scan_steps=2 (4 batches/epoch -> 2 dispatches) trains to a loss
    comparable with single-step dispatch, writes the same artifacts,
    and logs per-step losses."""
    out1 = str(tmp_path_factory.mktemp('scan_out1'))
    outk = str(tmp_path_factory.mktemp('scan_outk'))
    dir1, losses1 = _run(scene, out1, scan_steps=1)
    dirk, lossesk = _run(scene, outk, scan_steps=2)
    assert exists(join(dirk, 'checkpoints', 'ckpt-20.npz'))
    assert losses1[-1] < losses1[0]
    assert lossesk[-1] < lossesk[0]
    # Same data and step count; RNG streams differ (per-dispatch key
    # fold-in), so require the same ballpark, not bit equality
    assert lossesk[-1] < 2.5 * losses1[-1] + 1e-3, \
        (losses1, lossesk)


def test_scan_dispatch_remainder(scene, tmp_path_factory):
    """scan_steps=3 over 4 batches/epoch: one scan dispatch + one
    single-step remainder per epoch."""
    outk = str(tmp_path_factory.mktemp('scan_outr'))
    dirk, losses = _run(scene, outk, scan_steps=3)
    assert losses[-1] < losses[0]
    assert exists(join(dirk, 'checkpoints', 'ckpt-20.npz'))
