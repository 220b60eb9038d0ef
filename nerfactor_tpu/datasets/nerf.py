"""NeRF dataset: rays from per-view metadata.json + rgba.png.

Reference behavior: nerfactor/datasets/nerf.py -- views live in
{train,val,test}_??? dirs; rays come from a 4x4 cam_transform_mat and a
pinhole cam_angle_x; train batches are ``n_rays_per_step`` uniformly
random pixels of one view; vali/test batches are all rays of a view.
"""

from os.path import basename, dirname, join, exists

import numpy as np

from nerfactor_tpu.datasets.base import Dataset as BaseDataset
from nerfactor_tpu.ops import img as imgops
from nerfactor_tpu.utils import io as ioutil
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="datasets/nerf")


class Dataset(BaseDataset):
    array_keys = ('rayo', 'rayd', 'rgb')

    def __init__(self, config, mode, debug=False, always_all_rays=False,
                 spp=1, seed=0):
        self.meta2img = {}
        sps = np.sqrt(spp)
        assert sps == int(sps), (
            "Samples per pixel must be a square number so that samples per "
            "side are integers")
        self.sps = int(sps)
        self.always_all_rays = always_all_rays
        super().__init__(config, mode, debug=debug, seed=seed)

    def _get_batch_size(self):
        if self.mode == 'train':
            return self.config.getint('n_rays_per_step')
        # All rays of one view
        any_data = self._get_cached(self.files[0])
        return int(np.prod(any_data['hw'])) * self.sps ** 2

    def _glob(self):
        root = self.config.get('data_root')
        mode_str = 'val' if self.mode == 'vali' else self.mode
        metadata_dir = join(root, '%s_???' % mode_str)
        if self.mode == 'test':
            paths = ioutil.sortglob(metadata_dir, 'metadata.json')
            logger.info("Number of '%s' views: %d", self.mode, len(paths))
            return paths
        metadata_paths = []
        for metadata_path in ioutil.sortglob(metadata_dir, 'metadata.json'):
            img_path = join(dirname(metadata_path), 'rgba.png')
            if exists(img_path):
                metadata_paths.append(metadata_path)
                self.meta2img[metadata_path] = img_path
            else:
                logger.warn(
                    "Dropping camera %s: no rgba.png next to it (%s)",
                    metadata_path, img_path)
        logger.info("Number of '%s' views: %d", self.mode,
                    len(metadata_paths))
        return metadata_paths

    @staticmethod
    def _parse_id(metadata_path):
        return basename(dirname(metadata_path))

    def _load_one(self, metadata_path):
        imh = self.config.getint('imh')
        white_bg = self.config.getboolean('white_bg')
        id_ = self._parse_id(metadata_path)
        metadata = ioutil.read_json(metadata_path)
        imw = int(imh / metadata['imh'] * metadata['imw'])
        cam_to_world = np.array([
            float(x) for x in metadata['cam_transform_mat'].split(',')
        ]).reshape(4, 4)
        cam_angle_x = metadata['cam_angle_x']
        rayo, rayd = self._gen_rays(cam_to_world, cam_angle_x, imh, imw)
        rayo = rayo.astype(np.float32)
        rayd = rayd.astype(np.float32)
        if self.mode == 'test':
            rgb = np.zeros((imh * self.sps, imw * self.sps, 3), np.float32)
        else:
            rgba = ioutil.load_img(self.meta2img[metadata_path])
            assert rgba.ndim == 3 and rgba.shape[2] == 4, \
                "expected an HxWx4 RGBA image, got shape %s" % (rgba.shape,)
            if imh != rgba.shape[0]:
                rgba = imgops.resize(rgba, new_h=imh)
            rgb, alpha = rgba[:, :, :3], rgba[:, :, 3]
            bg = np.ones_like(rgb) if white_bg else np.zeros_like(rgb)
            rgb = imgops.alpha_blend(rgb, alpha, bg).astype(np.float32)
        return {'id': id_, 'hw': (imh, imw), 'rayo': rayo, 'rayd': rayd,
                'rgb': rgb}

    def _postprocess(self, data, rng):
        out = {'id': data['id'], 'hw': data['hw']}
        rayo, rayd, rgb = data['rayo'], data['rayd'], data['rgb']
        if self.mode in ('vali', 'test') or self.always_all_rays:
            out['rayo'] = rayo.reshape(-1, 3)
            out['rayd'] = rayd.reshape(-1, 3)
            out['rgb'] = rgb.reshape(-1, 3)
            return out
        n_pix = rayo.shape[0] * rayo.shape[1]
        sel = rng.integers(0, n_pix, size=self.bs)
        out['rayo'] = rayo.reshape(-1, 3)[sel]
        out['rayd'] = rayd.reshape(-1, 3)[sel]
        out['rgb'] = rgb.reshape(-1, 3)[sel]
        return out

    def _gen_rays(self, to_world, angle_x, imh, imw):
        """Pinhole rays in world space; supports ``sps``x supersampling
        per pixel side (reference datasets/nerf.py:172-215, incl. the
        optional and unused-in-shipped-configs NDC path)."""
        near = self.config.getfloat('near')
        ndc = self.config.getboolean('ndc')
        cam_loc = to_world[:3, 3]
        rayo = np.tile(cam_loc[None, None, :],
                       (imh * self.sps, imw * self.sps, 1))
        xs = np.linspace(0, imw, imw * self.sps, endpoint=False)
        ys = np.linspace(0, imh, imh * self.sps, endpoint=False)
        xs, ys = np.meshgrid(xs, ys)
        fl = 0.5 * imw / np.tan(0.5 * angle_x)
        rayd = np.stack(
            ((xs - 0.5 * imw) / fl, -(ys - 0.5 * imh) / fl,
             -np.ones_like(xs)), axis=-1)
        rayd = np.sum(rayd[:, :, np.newaxis, :] * to_world[:3, :3], axis=-1)
        if ndc:
            cv2gl_rot = np.diag((1.0, -1.0, -1.0))
            rayo = rayo.dot(cv2gl_rot)
            rayd = rayd.dot(cv2gl_rot)
            t = -(near + rayo[..., 2]) / rayd[..., 2]
            rayo = rayo + t[..., None] * rayd
            o1 = -1. / (imw / (2. * fl)) * rayo[..., 0] / rayo[..., 2]
            o2 = -1. / (imh / (2. * fl)) * rayo[..., 1] / rayo[..., 2]
            o3 = 1. + 2. * near / rayo[..., 2]
            d1 = -1. / (imw / (2. * fl)) * (
                rayd[..., 0] / rayd[..., 2] - rayo[..., 0] / rayo[..., 2])
            d2 = -1. / (imh / (2. * fl)) * (
                rayd[..., 1] / rayd[..., 2] - rayo[..., 1] / rayo[..., 2])
            d3 = -2. * near / rayo[..., 2]
            rayo = np.dstack((o1, o2, o3))
            rayd = np.dstack((d1, d2, d3))
        return rayo, rayd
