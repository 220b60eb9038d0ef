"""Writers for the distilled-geometry buffers shared between
geometry_from_nerf and the shape/nerfactor datasets.

Output contract (drop-in compatible with the reference,
geometry_from_nerf.py:107-111 + util/geom.py:27-79): per view dir --
alpha.png, xyz.npy + xyz.png, normal.npy + normal.png,
lvis.npy + lvis.png + lvis.mp4.
"""

from os.path import join

import numpy as np

from nerfactor_tpu.utils import io as ioutil, vis as visutil


def write_lvis(lvis, fps, out_dir, dtype=np.float32):
    """``dtype=np.float16`` halves the on-disk/IO cost of the largest
    buffer (H x W x 512); the loaders accept any dtype (values are in
    [0, 1], so f16 loses nothing material). f32 is the reference-
    compatible default."""
    ioutil.save_np(np.asarray(lvis).astype(dtype), join(out_dir,
                                                        'lvis.npy'))
    lvis_avg = np.mean(lvis, axis=2)
    ioutil.write_img(lvis_avg, join(out_dir, 'lvis.png'))
    frames = []
    for i in range(lvis.shape[2]):
        frame = (np.clip(lvis[:, :, i], 0, 1) * 255).astype(np.uint8)
        frames.append(np.dstack([frame] * 3))
    visutil.make_video(frames, join(out_dir, 'lvis.mp4'), fps=fps)


def write_xyz(xyz, out_dir):
    xyz = np.asarray(xyz)
    ioutil.save_np(xyz.astype(np.float32), join(out_dir, 'xyz.npy'))
    rng = xyz.max() - xyz.min()
    norm = (xyz - xyz.min()) / (rng if rng > 0 else 1.0)
    ioutil.write_img(norm, join(out_dir, 'xyz.png'))


def write_normal(normal, out_dir):
    normal = np.asarray(normal)
    ioutil.save_np(normal.astype(np.float32), join(out_dir, 'normal.npy'))
    ioutil.write_img((normal + 1) / 2, join(out_dir, 'normal.png'))


def write_alpha(alpha, out_dir):
    ioutil.write_img(np.asarray(alpha), join(out_dir, 'alpha.png'))
