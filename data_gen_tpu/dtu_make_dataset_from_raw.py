"""Converts RAW DTU captures (pos_???.txt projection matrices +
rectified images) into the framework's per-view layout, mirroring
the LLFF-style recenter/spherify pipeline.

Reference behavior: data_gen/dtu_mvs/make_dataset_from_raw.py:1-97 --
per scene: glob `pos_???.txt` 3x4 projection matrices from --cam_dir
and the most-diffusely-lit images (`*_3_*.png`) from
--img_root/<scene>, resize to --h, decompose each P into K/R/t
(cv2.decomposeProjectionMatrix there; our own RQ-based
camera.decompose_projection here), convert the world-to-camera CV
extrinsics to OpenGL camera-to-world, pack LLFF Nx3x5 hwf poses, and
feed the shared gen_data writer (recenter -> spherify -> per-view
rgba.png + metadata.json + transforms_*.json).

CLI parity:
  python -m data_gen_tpu.dtu_make_dataset_from_raw \
      --cam_dir=/dtu/Calibration/cal18 --img_root=/dtu/Rectified \
      --outroot=/out --scenes=scan105,scan106 [--h=256] [--n_vali=2]
"""

import argparse
import os
from os.path import join, basename

import numpy as np

from data_gen_tpu import camera as camlib
from data_gen_tpu import poses as poselib
from data_gen_tpu.nerf_real_make_dataset import write_views
from nerfactor_tpu.ops import img as imgops
from nerfactor_tpu.utils import io as ioutil
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="data_gen/dtu_raw")

# OpenCV camera axes (x right, y down, z forward) -> OpenGL/NeRF
# (x right, y up, z backward); reference uses xm.camera.CVCAM_TO_GLCAM
CVCAM_TO_GLCAM = np.array(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]],
    np.float64)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--cam_dir', required=True,
                   help="directory of pos_???.txt projection matrices")
    p.add_argument('--img_root', required=True,
                   help="root holding <scene>/ image dirs")
    p.add_argument('--scenes', required=True,
                   help="comma-separated scene names under img_root")
    p.add_argument('--h', type=int, default=256)
    p.add_argument('--n_vali', type=int, default=2)
    p.add_argument('--outroot', required=True)
    p.add_argument('--debug', action='store_true')
    p.add_argument('--overwrite', action='store_true')
    return p.parse_args(argv)


def pose_from_projection(P, factor, imh, imw):
    """One 3x4 DTU projection matrix -> LLFF 3x5 (c2w | hwf) pose.

    Matches make_dataset_from_raw.py:69-85: K from the projection
    decomposition, w2c = inv(K) P (CV), CV->GL axis flip, invert to
    c2w, single focal = mean(fx, fy) scaled by the resize factor.
    """
    P = np.asarray(P, np.float64)
    K, _, _ = camlib.decompose_projection(P)
    rt = np.linalg.inv(K) @ P  # w2c, CV convention
    rt = CVCAM_TO_GLCAM[:3, :3] @ rt  # w2c, GL convention
    f = (K[0, 0] + K[1, 1]) / 2
    f *= 1.0 / factor
    rt = np.vstack([rt, [0, 0, 0, 1]])
    c2w = np.linalg.inv(rt)
    hwf = np.array([imh, imw, f], np.float64).reshape(3, 1)
    return np.hstack((c2w[:3, :], hwf))


def load_raw_scene(cam_dir, img_dir, out_h, debug=False):
    """-> (poses Nx3x5, imgs NxHxWx4, img_paths)."""
    cam_paths = [p for p in ioutil.sortglob(cam_dir)
                 if basename(p).startswith('pos_')
                 and p.endswith('.txt')]
    img_paths = [p for p in ioutil.sortglob(img_dir)
                 if '_3_' in basename(p) and p.lower().endswith('.png')]
    assert img_paths, "No image globbed"
    # In case only the first cameras were used to capture images
    cam_paths = cam_paths[:len(img_paths)]
    if debug:
        cam_paths, img_paths = cam_paths[:4], img_paths[:4]
    assert len(cam_paths) == len(img_paths), (
        "Mismatch between numbers of images (%d) and poses (%d)"
        % (len(img_paths), len(cam_paths)))
    imgs, poses, factor = [], [], None
    for img_path, cam_path in zip(img_paths, cam_paths):
        img = ioutil.load_img(img_path)
        if factor is None:
            factor = float(img.shape[0]) / out_h
        else:
            assert float(img.shape[0]) / out_h == factor, \
                "Images are of varying sizes"
        img = imgops.resize(img, new_h=out_h)
        if img.shape[2] == 3:
            # NOTE: add an all-one alpha (reference :62-64)
            img = np.dstack((img, np.ones_like(img[:, :, :1])))
        imgs.append(img)
        P = np.loadtxt(cam_path)
        poses.append(pose_from_projection(
            P, factor, img.shape[0], img.shape[1]))
    imgs = np.stack(imgs, axis=0)
    poses = np.stack(poses, axis=0).astype(np.float32)
    return poses, imgs, img_paths


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.outroot, exist_ok=True)
    for scene in args.scenes.split(','):
        outdir = join(args.outroot, scene)
        if os.path.exists(outdir) and not args.overwrite:
            logger.info("Skipping existing %s", outdir)
            continue
        poses, imgs, img_paths = load_raw_scene(
            args.cam_dir, join(args.img_root, scene), args.h,
            debug=args.debug)
        poses = poselib.recenter_poses(poses)
        poses, test_poses = poselib.spherify_poses(poses)
        write_views(poses, test_poses, imgs, img_paths, args.n_vali,
                    outdir)
        logger.info("Done: %s", outdir)


if __name__ == '__main__':
    main()
