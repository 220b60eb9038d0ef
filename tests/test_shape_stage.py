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


def test_lvis_memmap_lazy_loading(tmp_path):
    """At native resolution, lvis stays a memory map in the cached view
    and only the sampled rows materialize -- the reference-scale buffer
    is 512 MB/view (SURVEY hard part #9). f16-packed buffers load too."""
    import numpy as np
    from tests import synth
    from nerfactor_tpu.datasets.nerf_shape import Dataset
    from nerfactor_tpu.utils import config as configutil
    root = str(tmp_path / 'scene')
    synth.make_scene(root, n_train=2, n_vali=1, n_test=1, imh=8,
                     with_buffers=True, light_h=2)
    # Repack one view's lvis as f16 (the --lvis_dtype path)
    lv_path = join(root, 'surf', 'train_000', 'lvis.npy')
    lv32 = np.load(lv_path)
    np.save(lv_path, lv32.astype(np.float16))
    parser = configutil.read_config(
        configutil.resolve_config_path('shape.ini'))
    configutil.apply_override(parser, ','.join([
        'data_root=%s' % root, 'data_nerf_root=%s/surf' % root,
        'imh=8', 'light_h=2', 'n_rays_per_step=16']))
    ds = Dataset(configutil.Config(parser), 'train')
    f16_file = [f for f in ds.files if 'train_000' in f][0]
    data = ds._load_one(f16_file)
    assert isinstance(data['lvis'], np.memmap), \
        "lvis should stay memory-mapped at native resolution"
    assert data['lvis'].dtype == np.float16
    rng = np.random.default_rng(0)
    batch = ds._postprocess(data, rng)
    # shape.ini ships lvis at its configured transfer dtype (f16 by
    # default; the jitted steps upcast on device)
    assert batch['lvis'].dtype == ds.lvis_transfer_dtype
    assert batch['lvis'].shape == (16, 8)  # bs x n_lights
    assert batch['lvis'].min() >= 0 and batch['lvis'].max() <= 1
    # Every sampled row must be an actual (f16-rounded) row of the
    # original f32 buffer
    ref_rows = np.clip(lv32.reshape(-1, 8).astype(np.float16)
                       .astype(np.float32), 0.0, 1.0)
    for row in batch['lvis'].astype(np.float32):
        assert (np.abs(ref_rows - row).max(axis=1) < 1e-3).any()
    # Full-image vali path materializes and clips
    ds_v = Dataset(configutil.Config(parser), 'vali')
    data_v = ds_v._load_one(ds_v.files[0])
    batch_v = ds_v._postprocess(data_v, rng)
    assert batch_v['lvis'].dtype == ds_v.lvis_transfer_dtype
    assert batch_v['lvis'].shape == (64, 8)


def test_shape_jitter_twin_merge_matches_direct_eval(shape_run):
    """The twin-merged smoothness probes (one stacked 2N-row pass per
    head) must equal evaluating each head directly at xyz + noise."""
    import jax
    import jax.numpy as jnp
    from nerfactor_tpu.models import get_model_class
    from nerfactor_tpu.utils import config as configutil
    from nerfactor_tpu.ops.math import safe_l2_normalize
    outdir = join(shape_run, 'lr1e-2')
    parser = configutil.read_config(outdir + '.ini')
    config = configutil.Config(parser)
    model = get_model_class('shape')(config)
    assert model.xyz_jitter_std > 0
    assert model.normal_smooth_weight > 0
    assert model.lvis_smooth_weight > 0
    params = model.init_params(jax.random.PRNGKey(2))
    rng = np.random.RandomState(0)
    n = 8
    xyz = rng.randn(n, 3).astype(np.float32)
    batch = {
        'rayo': xyz + 4.0, 'rayd': np.zeros((n, 3), np.float32),
        'rgb': rng.rand(n, 3).astype(np.float32),
        'alpha': np.ones((n, 1), np.float32),
        'xyz': xyz, 'normal': xyz.copy(),
        'lvis': rng.rand(n, model.n_lights).astype(np.float32),
    }
    key = jax.random.PRNGKey(5)
    pred, _, loss_kwargs, _ = model.apply(
        params, batch, mode='train', key=key)
    noise = model.xyz_jitter_std * jax.random.normal(key, xyz.shape)
    xyz_j = jnp.asarray(xyz) + noise
    normal_j = safe_l2_normalize(
        model.pred_normal_at(params, xyz_j), axis=1)
    lvis_j = model.pred_lvis_at(params, xyz_j, model.calc_ldir(xyz_j))
    np.testing.assert_allclose(
        np.asarray(loss_kwargs['normal_jitter']), np.asarray(normal_j),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(loss_kwargs['lvis_jitter']), np.asarray(lvis_j),
        rtol=1e-5, atol=1e-5)
    main_lvis = model.pred_lvis_at(
        params, jnp.asarray(xyz), model.calc_ldir(jnp.asarray(xyz)))
    np.testing.assert_allclose(
        np.asarray(pred['lvis']), np.asarray(main_lvis),
        rtol=1e-5, atol=1e-5)
