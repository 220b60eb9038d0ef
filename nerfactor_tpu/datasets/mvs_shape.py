"""MVS-initialized shape dataset: same tuple as nerf_shape, but buffers
(and rgba) live in ``mvs_root``, ray origins come from a 'cam_loc'
metadata entry, and ray directions are dummies.

Reference behavior: nerfactor/datasets/mvs_shape.py.
"""

from os.path import join

import numpy as np

from nerfactor_tpu.datasets.nerf_shape import Dataset as BaseDataset
from nerfactor_tpu.ops import img as imgops
from nerfactor_tpu.utils import io as ioutil
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="datasets/mvs_shape")


class Dataset(BaseDataset):
    def _glob(self):
        mvs_root = self.config.get('mvs_root')
        mode_str = 'val' if self.mode == 'vali' else self.mode
        if self.debug:
            logger.warn("Debug mode: restricting the glob to one view")
            metadata_dir = join(mvs_root, '%s_000' % mode_str)
        else:
            metadata_dir = join(mvs_root, '%s_???' % mode_str)
        metadata_paths, incomplete_paths = [], []
        for metadata_path in ioutil.sortglob(metadata_dir, 'metadata.json'):
            id_ = self._parse_id(metadata_path)
            view_dir = join(mvs_root, id_)
            paths = {
                'xyz': join(view_dir, 'xyz.npy'),
                'normal': join(view_dir, 'normal.npy'),
                'lvis': join(view_dir, 'lvis.npy'),
                'alpha': join(view_dir, 'alpha.png')}
            if self.mode != 'test':
                paths['rgba'] = join(view_dir, 'rgba.png')
            if ioutil.all_exist(paths):
                metadata_paths.append(metadata_path)
                self.meta2buf[metadata_path] = paths
            else:
                incomplete_paths.append(metadata_path)
        if incomplete_paths:
            logger.warn(
                "Dropping views with missing geometry buffers:\n\t%s",
                incomplete_paths)
        logger.info("Number of '%s' views: %d", self.mode,
                    len(metadata_paths))
        return metadata_paths

    def _load_one(self, metadata_path):
        imh = self.config.getint('imh')
        use_nerf_alpha = self.config.getboolean('use_nerf_alpha',
                                                fallback=False)
        id_ = self._parse_id(metadata_path)
        metadata = ioutil.read_json(metadata_path)
        h, w = metadata['imh'], metadata['imw']
        cam_loc = np.array(metadata['cam_loc'])
        rayo = np.tile(cam_loc[None, None, :], (h, w, 1)).astype(np.float32)
        rayd = np.zeros_like(rayo)  # dummy
        paths = self.meta2buf[metadata_path]
        xyz = ioutil.load_np(paths['xyz'])
        normal = ioutil.load_np(paths['normal'])
        if self.debug:
            logger.warn("Faking light visibility for faster debugging")
            lvis = 0.5 * np.ones(normal.shape[:2] + (512,), np.float32)
        else:
            # Memory-mapped: rows materialize after ray sampling (see
            # nerf_shape._load_one)
            lvis = np.load(paths['lvis'], mmap_mode='r')
            if imh != lvis.shape[0]:
                lvis = np.asarray(lvis, np.float32)
        if self.mode == 'test':
            alpha = ioutil.load_img(paths['alpha'])
            rgb = np.zeros_like(xyz)
        else:
            rgba = ioutil.load_img(paths['rgba'])
            assert rgba.ndim == 3 and rgba.shape[2] == 4, \
                "Input image is not RGBA"
            rgb = rgba[:, :, :3]
            if use_nerf_alpha:
                alpha = ioutil.load_img(paths['alpha'])
            else:
                alpha = rgba[:, :, 3]
        if alpha.ndim == 3:
            alpha = alpha[:, :, 0]
        if imh != xyz.shape[0]:
            xyz = imgops.resize(xyz, new_h=imh)
            normal = imgops.resize(normal, new_h=imh)
            lvis = imgops.resize(lvis, new_h=imh)
            alpha = imgops.resize(alpha, new_h=imh)
            rgb = imgops.resize(rgb, new_h=imh)
            rayo = imgops.resize(rayo, new_h=imh)
            rayd = imgops.resize(rayd, new_h=imh)
        assert not np.isclose(xyz, rayo).all(axis=2).any(), \
            "Found XYZs coinciding with the camera"
        norm = np.linalg.norm(normal, axis=2, keepdims=True)
        normal = normal / np.maximum(norm, 1e-12)
        return {
            'id': id_, 'hw': tuple(xyz.shape[:2]),
            'rayo': rayo.astype(np.float32),
            'rayd': rayd.astype(np.float32),
            'rgb': rgb.astype(np.float32),
            'alpha': alpha.astype(np.float32),
            'xyz': xyz.astype(np.float32),
            'normal': normal.astype(np.float32),
            'lvis': lvis,  # clip + f32 cast post-sampling (_postprocess)
        }
