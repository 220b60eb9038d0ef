"""MERL BRDF database: binary reader + coordinate transforms.

The MERL 100 database (Matusik et al. 2003) stores each material as a
(theta_h, theta_d, phi_d) = (90, 90, 180) cube per channel, with a
quadratic mapping along theta_h. Public format: three int32 dims followed
by float64 data, channel-major, with per-channel scales (1.0, 1.15, 1.66)
/ 1500. Behavioral contract mirrors brdf/merl/merl.py +
third_party/nielsen2015on/{merlFunctions,coordinateFunctions}.py of the
reference (e.g. the 0.105 half-pixel offset in the theta_h unmapping).
"""

from os.path import basename

import numpy as np

# BRDF cube layout used throughout: (phi_d, theta_h, theta_d)
BRDF_SHAPE = (180, 90, 90)
_CHANNEL_SCALES = np.array([1.0, 1.15, 1.66]) / 1500.0


def read_merl_brdf(path):
    """Reads a .binary MERL file into a (180, 90, 90, 3) float cube laid
    out as (phi_d, theta_h, theta_d, rgb). Invalid entries are negative."""
    with open(path, 'rb') as h:
        dims = np.fromfile(h, dtype=np.int32, count=3)
        n = int(np.prod(dims))
        assert n == int(np.prod(BRDF_SHAPE)), \
            "Unexpected MERL dims: %s" % dims
        vals = np.fromfile(h, dtype=np.float64, count=3 * n)
    # Native layout: channel-major, (theta_h, theta_d, phi_d)
    cube = vals.reshape(3, 90, 90, 180)
    cube = cube * _CHANNEL_SCALES[:, None, None, None]
    # -> (phi_d, theta_h, theta_d, ch)
    return np.transpose(cube, (3, 1, 2, 0))


def merl_to_rusink(merl_coords):
    """BRDF cube indices -> Rusinkiewicz angles (phi_d, theta_h, theta_d),
    radians. theta_h uses the MERL quadratic mapping with the +0.105
    half-pixel offset (nielsen2015on/coordinateFunctions.py:21-27)."""
    shp = BRDF_SHAPE
    c = np.asarray(merl_coords, dtype=float).reshape(-1, 3).copy()
    c[:, 0] = c[:, 0] / (shp[0] - 1) * np.pi
    c[:, 1] = np.square((c[:, 1] + 0.105) / shp[1]) * (np.pi / 2)
    c[:, 2] = c[:, 2] / (shp[2] - 1) * (np.pi / 2)
    return c


def rusink_to_merl(rusink):
    """Rusinkiewicz angles -> BRDF cube indices (inverse of the above,
    with floor + clipping)."""
    shp = BRDF_SHAPE
    c = np.asarray(rusink, dtype=float).reshape(-1, 3).copy()
    c[:, 0] = np.clip(np.floor(c[:, 0] / np.pi * shp[0]), 0, shp[0] - 1)
    c[:, 1] = np.clip(
        np.floor(np.sqrt(c[:, 1] / (np.pi / 2)) * shp[1]), 0, shp[1] - 1)
    c[:, 2] = np.clip(
        np.floor(c[:, 2] / (np.pi / 2) * shp[2]), 0, shp[2] - 1)
    return c


def dirs_to_rusink(a, b):
    """NumPy twin of nerfactor_tpu.ops.geom.dir2rusink for offline tools."""
    def normalize(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    def rot_vec(vec, axis, angle):
        axis = np.asarray(axis, dtype=float).reshape(1, 3)
        cos_a = np.cos(angle).reshape(-1, 1)
        sin_a = np.sin(angle).reshape(-1, 1)
        dot = vec @ axis.T
        return vec * cos_a + axis * dot * (1 - cos_a) \
            + np.cross(np.broadcast_to(axis, vec.shape), vec) * sin_a

    a = normalize(np.asarray(a, float).reshape(-1, 3))
    b = normalize(np.asarray(b, float).reshape(-1, 3))
    h = normalize((a + b) / 2)
    theta_h = np.arccos(np.clip(h[:, 2], -1, 1))
    phi_h = np.arctan2(h[:, 1], h[:, 0])
    diff = rot_vec(rot_vec(b, (0, 0, 1), -phi_h), (0, 1, 0), -theta_h)
    theta_d = np.arccos(np.clip(diff[:, 2], -1, 1))
    phi_d = np.mod(np.arctan2(diff[:, 1], diff[:, 0]), np.pi)
    return np.column_stack((phi_d, theta_h, theta_d))


class MERL:
    """One MERL material (or the Lambertian unit cube when path=None)."""

    def __init__(self, path=None):
        if path is None:
            cube_rgb = np.ones(BRDF_SHAPE, dtype=float)
            cube_rgb = np.tile(cube_rgb[:, :, :, None], (1, 1, 1, 3))
            name = 'lambertian'
        else:
            cube_rgb = read_merl_brdf(path)
            name = self.parse_name(path)
        self._cube_rgb = cube_rgb
        self.name = name
        self.cube_rusink = self._get_merl_rusink(flat=False)
        self.flat_rusink = self._get_merl_rusink(flat=True)
        self.kdtree = None

    @property
    def cube_rgb(self):
        return self._cube_rgb

    @cube_rgb.setter
    def cube_rgb(self, x):
        assert x.shape == self._cube_rgb.shape, \
            "Reflectance must be stored in a cube of shape %s" % (
                self._cube_rgb.shape,)
        self._cube_rgb = x

    @property
    def flat_rgb(self):
        return np.reshape(self.cube_rgb, (-1, 3))

    @property
    def tbl(self):
        """(n_valid, 6) of [rusink | rgb], invalid (-1) rows dropped."""
        rusink_rgb = np.hstack((self.flat_rusink, self.flat_rgb))
        valid = (rusink_rgb[:, 3:] > 0).all(axis=1)
        return rusink_rgb[valid, :]

    @staticmethod
    def parse_name(path):
        return basename(path)[:-len('.binary')]

    @staticmethod
    def _get_merl_rusink(flat=False):
        ind = np.indices(BRDF_SHAPE)  # 3 x 180 x 90 x 90
        ind_flat = np.reshape(ind, (3, -1)).T
        rusink_flat = merl_to_rusink(ind_flat)
        if flat:
            return rusink_flat
        return np.reshape(rusink_flat, BRDF_SHAPE + (3,))

    def get_characterstic_slice(self):
        """phi_d = 90 deg slice, rotated so theta_d is vertical."""
        phi_i = self.cube_rgb.shape[0] // 2
        cslice = self.cube_rgb[phi_i, :, :]
        return np.rot90(cslice, axes=(0, 1))

    def get_characterstic_slice_rusink(self):
        phi_i = self.cube_rusink.shape[0] // 2
        rusink = self.cube_rusink[phi_i, :, :, :]
        return np.rot90(rusink, axes=(0, 1))

    @staticmethod
    def characteristic_slice_as_img(cslice, clip_percentile=80, gamma=2.2):
        maxv = np.percentile(cslice, clip_percentile)
        if maxv <= 0:
            maxv = max(cslice.max(), 1e-8)
        cslice_0to1 = np.clip(cslice, 0, maxv) / maxv
        cslice_gamma = np.power(cslice_0to1, 1 / gamma)
        return (cslice_gamma * 255).astype(np.uint8)

    @staticmethod
    def dir2rusink(ldir, vdir):
        """ldir (H, W, L, 3), vdir (H, W, 3), both in local frames."""
        ldir_flat = np.reshape(ldir, (-1, 3))
        vdir_rep = np.tile(vdir[:, :, None, :], (1, 1, ldir.shape[2], 1))
        vdir_flat = np.reshape(vdir_rep, (-1, 3))
        rusink = dirs_to_rusink(vdir_flat, ldir_flat)
        return np.reshape(rusink, ldir.shape)

    def query(self, qrusink):
        """Nearest-neighbor reflectance lookup via k-d tree."""
        from scipy.spatial import cKDTree
        if self.kdtree is None:
            self.kdtree = cKDTree(self.tbl[:, :3])
        _, ind = self.kdtree.query(qrusink)
        return self.tbl[ind, 3:]
