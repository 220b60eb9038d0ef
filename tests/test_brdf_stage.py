"""End-to-end test of the BRDF-prior stage: synthetic MERL npz tables ->
trainvali driver -> loss decreases, checkpoints + vis artifacts appear.
This is the reference's "minimum slice" (SURVEY.md section 7 step 3)."""

import os
from os.path import join, exists

import numpy as np
import pytest

from nerfactor_tpu.utils import io as ioutil


def _fake_merl_npz(root, n_mats=3, n_rows=512):
    """Writes tiny train_/vali_/test npz tables shaped like
    data_gen/merl/make_dataset.py outputs."""
    rng = np.random.RandomState(0)
    common = {'envmap_h': 16, 'ims': 32, 'spp': 1}
    for i in range(n_mats):
        name = 'mat%02d' % i
        rusink = rng.rand(n_rows, 3).astype(np.float32) * [np.pi, np.pi / 2,
                                                           np.pi / 2]
        refl = (0.1 + rng.rand(n_rows, 1) * (i + 1)).astype(np.float32)
        for mode, sl in (('train', slice(0, n_rows - 32)),
                         ('vali', slice(n_rows - 32, n_rows))):
            ioutil.save_npz(
                dict(common, i=i, name=name, rusink=rusink[sl],
                     refl=refl[sl]),
                join(root, '%s_%s.npz' % (mode, name)))
    test_rusink = rng.rand(64, 3).astype(np.float32)
    ioutil.save_npz(dict(common, rusink=test_rusink),
                    join(root, 'test.npz'))


@pytest.fixture(scope='module')
def brdf_run(tmp_path_factory):
    root = tmp_path_factory.mktemp('brdf_data')
    outroot = tmp_path_factory.mktemp('brdf_out')
    _fake_merl_npz(str(root))
    from nerfactor_tpu import trainvali
    override = ','.join([
        'data_root=%s' % root,
        'outroot=%s' % outroot,
        'epochs=30',
        'ckpt_period=10',
        'vali_period=30',
        'vali_batches=2',
        'n_rays_per_step=128',
        'lr=1e-2',
    ])
    trainvali.main(['--config', 'brdf.ini', '--config_override', override])
    return str(outroot)


def test_brdf_training_artifacts(brdf_run):
    outdir = join(brdf_run, 'lr1e-2')
    assert exists(outdir + '.ini'), "Resolved config not dumped"
    ckpts = os.listdir(join(outdir, 'checkpoints'))
    assert 'ckpt-30.npz' in ckpts
    # Scalar summaries exist and loss decreased
    import json
    with open(join(outdir, 'summary_train', 'scalars.jsonl')) as h:
        recs = [json.loads(line) for line in h]
    losses = [r['loss_train'] for r in recs if 'loss_train' in r]
    assert len(losses) >= 2
    assert losses[-1] < losses[0], \
        "Training loss did not decrease: %s" % losses
    # Validation vis: HTML gallery + per-batch artifacts
    vali_epochs = os.listdir(join(outdir, 'vis_vali'))
    assert vali_epochs, "No validation vis epochs"
    epoch_dir = join(outdir, 'vis_vali', sorted(vali_epochs)[-1])
    assert exists(join(epoch_dir, 'all.html'))
    batch_dir = join(epoch_dir, 'batch000000000')
    assert exists(join(batch_dir, 'metadata.json'))
    assert exists(join(batch_dir, 'z.png'))
    assert exists(join(batch_dir, 'log10_brdf.png'))


def test_brdf_resume(brdf_run):
    """Restarting with more epochs resumes from the latest checkpoint."""
    from nerfactor_tpu import trainvali
    outdir = join(brdf_run, 'lr1e-2')
    data_root = None
    # Recover data_root from the dumped config (config-from-ckpt parity)
    from nerfactor_tpu.utils import config as configutil
    parser = configutil.read_config(outdir + '.ini')
    data_root = parser.get('DEFAULT', 'data_root')
    override = ','.join([
        'data_root=%s' % data_root,
        'outroot=%s' % brdf_run,
        'epochs=35',
        'ckpt_period=5',
        'vali_period=1000',
        'n_rays_per_step=128',
        'lr=1e-2',
    ])
    trainvali.main(['--config', 'brdf.ini', '--config_override', override])
    ckpts = os.listdir(join(outdir, 'checkpoints'))
    assert 'ckpt-35.npz' in ckpts
