"""Offline data-generation tooling: MERL -> npz conversion and COLMAP
(LLFF) real-capture ingestion, driven end-to-end on synthetic inputs."""

import json
import os
from os.path import join, exists

import numpy as np
import pytest

from nerfactor_tpu.utils import io as ioutil


# ------ MERL conversion ------

def _write_fake_merl(path, seed=0):
    """Full-size MERL .binary with random positive reflectance."""
    rng = np.random.RandomState(seed)
    dims = np.array([90, 90, 180], np.int32)  # native (th, td, pd) dims
    vals = rng.rand(3, 90, 90, 180).astype(np.float64) * 100.0
    with open(path, 'wb') as h:
        dims.tofile(h)
        vals.ravel().tofile(h)


@pytest.fixture(scope='module')
def merl_run(tmp_path_factory):
    indir = str(tmp_path_factory.mktemp('merl_bin'))
    outdir = str(tmp_path_factory.mktemp('merl_npz'))
    for name in ('fake-red', 'fake-blue'):
        _write_fake_merl(join(indir, name + '.binary'),
                         seed=hash(name) % 100)
    from data_gen_tpu import merl_make_dataset
    merl_make_dataset.main([
        '--indir', indir, '--outdir', outdir, '--envmap_h', '4',
        '--ims', '32', '--spp', '1'])
    return outdir


def test_merl_npz_tables(merl_run):
    for name in ('fake-red', 'fake-blue'):
        train = np.load(join(merl_run, 'train_%s.npz' % name))
        vali = np.load(join(merl_run, 'vali_%s.npz' % name))
        n_total = 180 * 90 * 90
        assert train['rusink'].shape[1] == 3
        assert train['refl'].shape[1] == 1
        assert train['rusink'].shape[0] + vali['rusink'].shape[0] == n_total
        # 1% validation split
        assert abs(vali['rusink'].shape[0] / n_total - 0.01) < 0.002
        assert (train['refl'] > 0).all()
        # Rusinkiewicz ranges
        r = train['rusink']
        assert r[:, 0].min() >= 0 and r[:, 0].max() <= np.pi
        assert r[:, 1].max() <= np.pi / 2 and r[:, 2].max() <= np.pi / 2


def test_merl_test_table_and_vis(merl_run):
    test = np.load(join(merl_run, 'test.npz'))
    # cslice rows (90*90 for the theta_d x theta_h slice) come first
    assert test['rusink'].shape[0] > 90 * 90
    assert int(test['envmap_h']) == 4 and int(test['ims']) == 32
    for sub in ('cslice', 'cslice_achromatic', 'render',
                'render_achromatic'):
        assert exists(join(merl_run, 'vis', sub, 'fake-red.png'))


def test_merl_feeds_brdf_dataset(merl_run):
    """The generated npz tables must load through the brdf_merl dataset."""
    from nerfactor_tpu.datasets import get_dataset_class
    from nerfactor_tpu.utils import config as configutil
    parser = configutil.read_config(
        configutil.resolve_config_path('brdf.ini'))
    configutil.apply_override(
        parser, 'data_root=%s,n_rays_per_step=64' % merl_run)
    config = configutil.Config(parser)
    Dataset = get_dataset_class('brdf_merl')
    ds = Dataset(config, 'train')
    batch = next(iter(ds.build_pipeline()))
    assert batch['rusink'].shape == (64, 3)
    assert batch['refl'].shape == (64, 1)


# ------ COLMAP/LLFF ingestion ------

@pytest.fixture(scope='module')
def colmap_scene(tmp_path_factory):
    """Synthetic LLFF capture: ring cameras in the LLFF (down, right,
    backward) convention + random images."""
    from tests import synth
    scene = str(tmp_path_factory.mktemp('colmap'))
    img_dir = join(scene, 'images')
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    n, h, w, fl = 6, 32, 48, 60.0
    cams = synth.ring_cameras(n, dist=4.0)
    rows = []
    for i, c2w in enumerate(cams):
        ioutil.write_img(rng.rand(h * 2, w * 2, 3).astype(np.float32),
                         join(img_dir, 'img_%03d.png' % i))
        nerf = c2w[:3, :4]  # columns: right, up, backward
        llff = np.concatenate(
            [-nerf[:, 1:2], nerf[:, 0:1], nerf[:, 2:]], axis=1)
        pose = np.concatenate(
            [llff, np.array([h * 2, w * 2, fl]).reshape(3, 1)], axis=1)
        near_far = np.array([2.0, 6.0])
        rows.append(np.concatenate([pose.ravel(), near_far]))
    np.save(join(scene, 'poses_bounds.npy'), np.stack(rows))
    return scene


@pytest.fixture(scope='module')
def real_dataset(colmap_scene, tmp_path_factory):
    out = str(tmp_path_factory.mktemp('real_out'))
    from data_gen_tpu import nerf_real_make_dataset
    nerf_real_make_dataset.main([
        '--scene_dir', colmap_scene, '--outroot', out, '--h', '32',
        '--n_vali', '2'])
    return out


def test_real_capture_layout(real_dataset):
    train_views = ioutil.sortglob(real_dataset, 'train_???')
    val_views = ioutil.sortglob(real_dataset, 'val_???')
    test_views = ioutil.sortglob(real_dataset, 'test_???')
    assert len(train_views) == 4 and len(val_views) == 2
    assert len(test_views) == 120
    for v in train_views:
        assert exists(join(v, 'rgba.png'))
        meta = ioutil.read_json(join(v, 'metadata.json'))
        assert meta['imh'] == 32
        mat = np.array([float(x) for x in
                        meta['cam_transform_mat'].split(',')]).reshape(4, 4)
        np.testing.assert_allclose(mat[3], [0, 0, 0, 1])
    # Test views carry the nearest input for the result videos
    assert exists(join(test_views[0], 'nn.png'))
    # NeRF-interop JSONs
    for f in ('transforms_train.json', 'transforms_val.json',
              'transforms_test.json'):
        with open(join(real_dataset, f)) as h:
            meta = json.load(h)
        assert 'camera_angle_x' in meta and meta['frames']


def test_real_capture_spherified(real_dataset):
    """After spherification all cameras sit near the unit sphere."""
    dists = []
    for v in ioutil.sortglob(real_dataset, 'train_???'):
        meta = ioutil.read_json(join(v, 'metadata.json'))
        mat = np.array([float(x) for x in
                        meta['cam_transform_mat'].split(',')]).reshape(4, 4)
        dists.append(np.linalg.norm(mat[:3, 3]))
    np.testing.assert_allclose(dists, 1.0, rtol=0.2)


def test_recenter_poses_identity():
    """Recentring must put the average pose at the identity."""
    from data_gen_tpu import poses as poselib
    from tests import synth
    # An arc (not a full ring: a symmetric ring's mean forward vector is
    # parallel to up, which makes the average pose degenerate)
    cams = []
    for az_deg in (-30, -15, 0, 15, 30):
        az, el = np.deg2rad(az_deg), np.deg2rad(25.0)
        loc = 3.0 * np.array([np.cos(el) * np.cos(az),
                              np.cos(el) * np.sin(az), np.sin(el)])
        cams.append(synth.look_at_c2w(loc))
    hwf = np.array([32.0, 48.0, 60.0]).reshape(3, 1)
    poses = np.stack(
        [np.concatenate([c[:3, :4], hwf], axis=1) for c in cams])
    rec = poselib.recenter_poses(poses)
    avg = poselib.average_pose(rec)
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-6)
