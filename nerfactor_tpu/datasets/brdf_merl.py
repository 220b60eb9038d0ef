"""MERL BRDF table dataset (reference datasets/brdf_merl.py).

Elements are BRDF identities. Train/vali elements come from
train_<name>.npz / vali_<name>.npz tables of (rusink, refl) rows; the test
element is a single shared table of Rusink. coordinates evaluated for 100
seen identities plus 209 interpolated identities named
'<i>_<w1>_<mat1>_<w2>_<mat2>' (reference :47-61).
"""

from os.path import basename

import numpy as np

from nerfactor_tpu.datasets.base import Dataset as BaseDataset
from nerfactor_tpu.utils import io as ioutil
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="datasets/brdf_merl")


class Dataset(BaseDataset):
    # Keys shipped to device for the jitted step; the rest is host-side
    # metadata for visualization.
    array_keys = ('rusink', 'refl', 'i')

    def __init__(self, config, mode, debug=False, seed=0, n_iden=20,
                 n_between=11, **kwargs):
        root = config.get('data_root')
        train_paths = ioutil.sortglob(root, 'train_*.npz')
        vali_paths = ioutil.sortglob(root, 'vali_*.npz')
        test_paths = ioutil.sortglob(root, 'test*.npz')
        assert len(test_paths) == 1, (
            "There should be a single set of test coordinates, shared by "
            "all identities")
        self.brdf_names = [
            basename(x)[len('train_'):-len('.npz')] for x in train_paths]
        self.test_data = ioutil.load_np(test_paths[0])
        # Synthesize test "paths": seen identities first, then interpolated
        # identities between a fixed random choice of materials.
        test_ids = list(self.brdf_names)
        rng = np.random.RandomState(seed)
        n_iden = min(n_iden, len(self.brdf_names))
        mats = rng.choice(self.brdf_names, n_iden, replace=False)
        i = 0
        for mat_i in range(n_iden - 1):
            mat1, mat2 = mats[mat_i], mats[mat_i + 1]
            for a in np.linspace(1, 0, n_between, endpoint=True):
                b = 1 - a
                test_ids.append(f'{i:06d}_{a:f}_{mat1}_{b:f}_{mat2}')
                i += 1
        self.paths = {
            'train': train_paths, 'vali': vali_paths, 'test': test_ids}
        super().__init__(config, mode, debug=debug, seed=seed)

    def _get_batch_size(self):
        return self.config.getint('n_rays_per_step')

    def get_n_brdfs(self):
        return len(self.paths[self.mode])

    def _glob(self):
        paths = self.paths[self.mode]
        logger.info("Number of '%s' identities: %d", self.mode, len(paths))
        return paths

    def _load_one(self, path):
        if self.mode == 'test':
            id_ = path  # synthetic identity string
            data = self.test_data
            i = self.brdf_names.index(id_) if id_ in self.brdf_names else -1
            rusink = np.asarray(data['rusink'], np.float32)
            refl = np.zeros((rusink.shape[0], 1), dtype=np.float32)
        else:
            data = ioutil.load_np(path)
            id_ = str(data['name'][()])
            if isinstance(id_, bytes):
                id_ = id_.decode()
            i = int(data['i'][()])
            rusink = np.asarray(data['rusink'], np.float32)
            refl = np.asarray(data['refl'], np.float32)
        return {
            'id': id_,
            'i': np.asarray(i, dtype=np.int32),
            'envmap_h': int(data['envmap_h'][()]),
            'ims': int(data['ims'][()]),
            'spp': int(data['spp'][()]),
            'rusink': rusink,
            'refl': refl,
        }

    def _postprocess(self, data, rng):
        if self.mode in ('vali', 'test'):
            return dict(data)
        # Training: sample rows with replacement
        n = data['rusink'].shape[0]
        sel = rng.integers(0, n, size=self.bs)
        out = dict(data)
        out['rusink'] = data['rusink'][sel]
        out['refl'] = data['refl'][sel]
        return out
