"""Executes the Blender-Cycles body of data_gen_tpu/nerf_synth_render.py
under the fake bpy API (tests/fake_bpy.py): scene stripping, camera
posing, RGBA + HDR/OLAT relight loops, albedo (diffuse[+glossy] color
passes) and world-normal pass wiring, metadata, transforms relabeling,
and the nearest-input composites.

Reference behavior: data_gen/nerf_synth/render.py:113-247. What the
fake cannot prove (Cycles light transport itself) is enumerated in
PARITY.md.
"""

import importlib
import json
import os
from os.path import join, exists

import numpy as np
import pytest

from tests import fake_bpy
from nerfactor_tpu.utils import io as ioutil


@pytest.fixture
def fake_blender():
    from _pytest.monkeypatch import MonkeyPatch
    mp = MonkeyPatch()
    module, fake = fake_bpy.install(mp)
    yield module, fake
    mp.undo()
    importlib.reload(module)  # restore the bpy-less module for others


def _write_inputs(root, n_train=2, n_val=2, n_test=2):
    cam_dir = join(root, 'cams')
    os.makedirs(cam_dir)
    rng = np.random.RandomState(0)

    def pose(i):
        mat = np.eye(4)
        mat[:3, 3] = [2.0 + i, i, 4.0]
        return mat.tolist()

    idx = 0
    for mode, n in (('train', n_train), ('val', n_val), ('test', n_test)):
        frames = []
        for i in range(n):
            frames.append({'file_path': './orig/r_%d' % idx,
                           'transform_matrix': pose(idx)})
            idx += 1
        with open(join(cam_dir, 'transforms_%s.json' % mode), 'w') as h:
            json.dump({'camera_angle_x': 0.6911, 'frames': frames}, h)
    light_npy = join(root, 'light.npy')
    np.save(light_npy, rng.rand(4, 8, 3).astype(np.float32))
    tld = join(root, 'test_lights')
    os.makedirs(tld)
    with open(join(tld, 'studio.hdr'), 'wb') as h:
        h.write(b'fake-hdr')  # only the path reaches the fake Cycles
    with open(join(tld, 'olat-0000-0000.json'), 'w') as h:
        json.dump({'point_location': [0.0, 0.0, 4.0]}, h)
    blend = join(root, 'scene.blend')
    with open(blend, 'wb') as h:
        h.write(b'fake-blend')
    return blend, cam_dir, light_npy, tld


def test_render_pipeline_under_fake_bpy(fake_blender, tmp_path):
    module, fake = fake_blender
    root = str(tmp_path)
    blend, cam_dir, light_npy, tld = _write_inputs(root)
    outdir = join(root, 'render_out')
    module.main([
        '--scene_path', blend, '--cam_dir', cam_dir,
        '--light_path', light_npy, '--test_light_dir', tld,
        '--light_inten', '3', '--res', '16', '--spp', '8',
        '--add_glossy_albedo', '--vali_first_n', '1',
        '--outdir', outdir])

    # ---- view dirs: 2 train + 1 val (vali_first_n) + 2 test ----
    view_dirs = sorted(d for d in os.listdir(outdir)
                       if os.path.isdir(join(outdir, d)))
    assert view_dirs == ['test_000', 'test_001', 'train_000',
                        'train_001', 'val_000']

    # ---- per-view artifacts ----
    for d in view_dirs:
        vd = join(outdir, d)
        meta = ioutil.read_json(join(vd, 'metadata.json'))
        assert meta['imh'] == meta['imw'] == 16
        assert meta['spp'] == 8
        assert meta['scene'] == 'scene.blend'
        assert meta['envmap'] == 'light.npy'
        assert meta['envmap_inten'] == 3
        mat = np.asarray([float(x) for x in
                          meta['cam_transform_mat'].split(',')])
        assert mat.shape == (16,)
        rgba = ioutil.load_img(join(vd, 'rgba.png'), force_rgba=True)
        assert rgba.shape == (16, 16, 4)
        # Relit ground truth under the test HDR and the OLAT
        hdr_gt = ioutil.load_img(join(vd, 'rgba_studio.png'))
        olat_gt = ioutil.load_img(join(vd, 'rgba_olat-0000-0000.png'))
        np.testing.assert_allclose(
            olat_gt[0, 0, :3], fake_bpy.OLAT_RENDER_COLOR, atol=1 / 128)
        assert not np.allclose(hdr_gt[..., :3], olat_gt[..., :3])
        # Albedo = diffuse + glossy color passes (alpha-carrying)
        albedo = ioutil.load_img(join(vd, 'albedo.png'))
        expect = (np.asarray(fake_bpy.DIFFUSE_COLOR)
                  + np.asarray(fake_bpy.GLOSSY_COLOR))
        np.testing.assert_allclose(albedo[0, 0, :3], expect, atol=1 / 128)
        # World normals as image: (n + 1) / 2
        normal = ioutil.load_img(join(vd, 'normal.png'))
        expect_n = (np.asarray(fake_bpy.NORMAL_VALUE) + 1) / 2
        np.testing.assert_allclose(normal[0, 0, :3], expect_n,
                                   atol=1 / 128)
        assert exists(join(vd, 'refball-normal.png'))
        assert exists(join(vd, 'diffuse-color.exr'))
        assert exists(join(vd, 'glossy-color.exr'))
        assert exists(join(vd, 'normal.exr'))

    # ---- transforms relabeled to ./<mode>_<i>/rgba ----
    for mode, n in (('train', 2), ('val', 1), ('test', 2)):
        with open(join(outdir, 'transforms_%s.json' % mode)) as h:
            data = json.load(h)
        assert len(data['frames']) == n
        for i, frame in enumerate(data['frames']):
            assert frame['file_path'] == './%s_%03d/rgba' % (mode, i)

    # ---- nearest-input composites for the test views ----
    for d in ('test_000', 'test_001'):
        nn = ioutil.load_img(join(outdir, d, 'nn.png'))
        assert nn.shape[:2] == (16, 16)

    # ---- scene hygiene: clutter stripped, refball removed ----
    names = [o.name for o in fake.data.objects]
    assert 'Camera' in names and 'Lego' in names
    for gone in ('Empty.001', 'BackgroundPlane', 'Sun', 'Glow',
                 'refball'):
        assert gone not in names, names
    # hide_render restored after the refball-only render
    assert not fake.data.objects['Lego'].hide_render
    # every scene open pointed at the .blend
    assert set(fake.opened_scenes) == {blend}


def test_render_view_skip_if_done(fake_blender, tmp_path):
    """Re-running must skip existing outputs (reference render.py's
    exists() guards), not re-render."""
    module, fake = fake_blender
    root = str(tmp_path)
    blend, cam_dir, light_npy, tld = _write_inputs(
        root, n_train=1, n_val=1, n_test=1)
    outdir = join(root, 'render_out')
    args = ['--scene_path', blend, '--cam_dir', cam_dir,
            '--light_path', light_npy, '--test_light_dir', tld,
            '--res', '8', '--spp', '4', '--outdir', outdir]
    module.main(args)
    stamp = os.path.getmtime(join(outdir, 'train_000', 'rgba.png'))
    module.main(args)
    assert os.path.getmtime(
        join(outdir, 'train_000', 'rgba.png')) == stamp


def test_main_without_bpy_raises_clear_error(tmp_path):
    from data_gen_tpu import nerf_synth_render as mod
    module = importlib.reload(mod)
    if module.HAS_BPY:  # pragma: no cover - impossible in this image
        pytest.skip('real bpy present')
    with pytest.raises(SystemExit, match='Blender'):
        module.main(['--scene_path', 'x', '--cam_dir', 'y',
                     '--light_path', 'z', '--outdir', str(tmp_path)])
