"""Pure (non-Blender) parts of the synthetic renderer + the debug
dataloader harness."""

import json
import os
from os.path import join, exists

import numpy as np

from nerfactor_tpu.utils import io as ioutil


def test_write_view_metadata(tmp_path):
    from data_gen_tpu.nerf_synth_render import write_view_metadata
    mat = np.arange(16, dtype=float).reshape(4, 4)
    data = write_view_metadata(
        str(tmp_path), mat, 0.69, 'lego.blend', 'interior.hdr', 3, 512,
        128)
    meta = ioutil.read_json(join(str(tmp_path), 'metadata.json'))
    assert meta == data
    parsed = np.array([float(x) for x in
                       meta['cam_transform_mat'].split(',')]).reshape(4, 4)
    np.testing.assert_array_equal(parsed, mat)
    assert meta['imh'] == meta['imw'] == 512 and meta['spp'] == 128


def test_relabel_and_nearest_inputs(tmp_path):
    from data_gen_tpu.nerf_synth_render import (
        relabel_transforms, save_test_nearest_inputs)
    from tests import synth
    out = str(tmp_path)
    rng = np.random.RandomState(0)
    # Fake transforms + rendered rgba for train/val; test views empty
    for mode, n, dist in (('train', 3, 4.0), ('val', 1, 4.2),
                          ('test', 2, 4.4)):
        frames = []
        for i, c2w in enumerate(synth.ring_cameras(n, dist=dist)):
            frames.append({'file_path': './orig/%d' % i,
                           'transform_matrix': c2w.tolist()})
        with open(join(out, 'cam_%s.json' % mode), 'w') as h:
            json.dump({'camera_angle_x': 0.69, 'frames': frames}, h)
        angle, relabeled = relabel_transforms(
            join(out, 'cam_%s.json' % mode), mode, out)
        assert angle == 0.69
        assert relabeled[0]['file_path'] == './%s_000/rgba' % mode
        for i in range(n):
            vdir = join(out, '%s_%03d' % (mode, i))
            os.makedirs(vdir, exist_ok=True)
            if mode != 'test':
                ioutil.write_img(
                    rng.rand(16, 16, 4).astype(np.float32),
                    join(vdir, 'rgba.png'))
    light_path = join(out, 'light.npy')
    np.save(light_path, rng.rand(8, 16, 3).astype(np.float32))
    save_test_nearest_inputs(out, light_path)
    for i in range(2):
        nn = join(out, 'test_%03d' % i, 'nn.png')
        assert exists(nn)
        img = ioutil.load_img(nn)
        assert img.shape[:2] == (16, 16)


def test_debug_dataloader(tmp_path):
    from tests import synth
    from nerfactor_tpu.debug import dataloader
    from nerfactor_tpu.utils import config as configutil
    root = str(tmp_path / 'scene')
    synth.make_scene(root, n_train=2, n_vali=1, n_test=1, imh=8)
    parser = configutil.read_config(
        configutil.resolve_config_path('nerf.ini'))
    configutil.apply_override(
        parser, 'data_root=%s,imh=8,n_rays_per_step=16' % root)
    ini = str(tmp_path / 'exp.ini')
    configutil.write_config(parser, ini)
    batch = dataloader.main(['--config_ini', ini, '--mode', 'train'])
    assert batch['rayo'].shape == (16, 3)
