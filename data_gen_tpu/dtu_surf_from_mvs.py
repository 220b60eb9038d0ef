"""DTU MVS ingestion: derives per-view geometry buffers (alpha, xyz,
normal, lvis) by ray-casting the trimmed MVS surface mesh, plus the
scene-shifted light sphere (lights.npz) the shape stage consumes.

CLI parity with data_gen/dtu_mvs/surf_from_mvs.py:
  python -m data_gen_tpu.dtu_surf_from_mvs \
      --cam_dir=... --surf_dir=... --img_dir=... --outdir=... \
      [--h=256] [--light_h=16] [--n_vali=2] [--n_test=120]
      [--lvis_eps=0.1] [--lvis_radius=1e5] [--spp=1] [--debug]

TPU-first: ray-mesh intersection runs as a batched Moller-Trumbore scan
on the accelerator (data_gen_tpu.raytrace) instead of the reference's
CPU Embree; the HxWxL lvis occlusion query is one flat batch of
secondary rays rather than a per-view Python loop.
"""

import argparse
import os
import shutil
from os.path import join, basename, exists

import numpy as np

from data_gen_tpu import camera as camlib, meshio, raytrace
from nerfactor_tpu.ops import img as imgops
from nerfactor_tpu.ops.light import gen_light_xyz
from nerfactor_tpu.utils import buffers, io as ioutil
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="data_gen/dtu_surf")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--cam_dir', required=True)
    p.add_argument('--surf_dir', required=True)
    p.add_argument('--img_dir', required=True)
    p.add_argument('--outdir', required=True)
    p.add_argument('--mesh_path', default=None,
                   help="explicit mesh path (overrides the DTU naming "
                        "convention '<surf_dir>/<base>NNN_l3_surf_11_"
                        "trim_8.ply')")
    p.add_argument('--h', type=int, default=256)
    p.add_argument('--light_h', type=int, default=16)
    p.add_argument('--n_vali', type=int, default=2)
    p.add_argument('--n_test', type=int, default=120)
    p.add_argument('--lvis_eps', type=float, default=1e-1)
    p.add_argument('--lvis_radius', type=float, default=1e5)
    p.add_argument('--lvis_fps', type=int, default=12)
    p.add_argument('--spp', type=int, default=1)
    p.add_argument('--skip_lvis', action='store_true')
    p.add_argument('--debug', action='store_true')
    p.add_argument('--overwrite', action='store_true')
    return p.parse_args(argv)


def _resolve_mesh_path(args):
    if args.mesh_path:
        return args.mesh_path
    scene = basename(args.img_dir.rstrip('/'))
    bn = basename(args.surf_dir.rstrip('/')) \
        + '%03d' % int(scene.lstrip('scan')) + '_l3_surf_11_trim_8.ply'
    return join(args.surf_dir, bn)


def _load_view_cam(cam_path, img_hw_orig, factor):
    """DTU pos_???.txt projection matrix -> PerspCam at the working
    resolution (surf_from_mvs.py:109-121)."""
    P = np.loadtxt(cam_path).reshape(3, 4)
    K, R, c = camlib.decompose_projection(P)
    f = (K[0, 0] + K[1, 1]) / 2 / factor
    h = int(round(img_hw_orig[0] / factor))
    w = int(round(img_hw_orig[1] / factor))
    K_new = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
    t = -R @ c
    ext = np.concatenate([R, t[:, None]], axis=1)
    return camlib.PerspCam(K_new, ext, imh=h, imw=w)


def cast_view(cam, vertices, faces, fnormals, spp=1):
    """One view's alpha/xyz/normal buffers via mesh ray casting."""
    ray_dirs = cam.gen_rays(spp=spp)  # (H, W, S, 3)
    hwn = ray_dirs.shape[:3]
    dirs_flat = ray_dirs.reshape(-1, 3)
    origs = np.tile(cam.loc[None, :], (dirs_flat.shape[0], 1))
    hit, t, tri = raytrace.intersect(origs, dirs_flat, vertices, faces)
    locs = origs + dirs_flat * t[:, None]
    alpha = hit.astype(np.float32).reshape(hwn).mean(axis=2)
    xyz = np.where(hit[:, None], locs, 0.0).reshape(
        hwn + (3,)).mean(axis=2).astype(np.float32)
    normal_flat = np.tile(
        np.array([0.0, 1.0, 0.0], np.float32), (dirs_flat.shape[0], 1))
    normal_flat[hit] = fnormals[tri[hit]]
    normal = normal_flat.reshape(hwn + (3,)).mean(axis=2)
    norm = np.linalg.norm(normal, axis=2, keepdims=True)
    normal = (normal / np.maximum(norm, 1e-12)).astype(np.float32)
    return alpha, xyz, normal


def cast_lvis(xyz, alpha, normal, lxyz_flat, vertices, faces, eps):
    """HxWxL light visibility: one flat batch of occlusion rays
    (surf_from_mvs.py:282-309, sans the per-view Python loop)."""
    h, w = xyz.shape[:2]
    n_lights = lxyz_flat.shape[0]
    origs = np.broadcast_to(
        xyz[:, :, None, :], (h, w, n_lights, 3)).reshape(-1, 3)
    dirs = lxyz_flat[None, None, :, :] - xyz[:, :, None, :]
    dirs = dirs / np.maximum(
        np.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    dirs = dirs.reshape(-1, 3)
    # March off the surface a bit to dodge self-intersection
    origs = origs + dirs * eps
    # Only foreground pixels need casting, but shapes stay static: rays
    # from background pixels are cast too and masked after
    hit, _, _ = raytrace.intersect(origs, dirs, vertices, faces,
                                   any_hit_only=True)
    lvis = (~hit).astype(np.float32).reshape(h, w, n_lights)
    cos = np.einsum('ijc,ijlc->ijl',
                    normal, dirs.reshape(h, w, n_lights, 3))
    lvis[cos <= 0] = 0
    lvis *= alpha[:, :, None]
    return lvis


def main(argv=None):
    args = parse_args(argv)
    if args.overwrite and exists(args.outdir):
        shutil.rmtree(args.outdir)
    os.makedirs(args.outdir, exist_ok=True)

    cam_paths = ioutil.sortglob(args.cam_dir, 'pos_???', ext='txt')
    img_paths = [p for p in ioutil.sortglob(args.img_dir, '*_3_*')
                 if p.endswith('.png')]  # the most diffuse lighting
    assert img_paths, "No image globbed"
    cam_paths = cam_paths[:len(img_paths)]
    if args.debug:
        img_paths, cam_paths = img_paths[:4], cam_paths[:4]
    assert len(cam_paths) == len(img_paths), (
        "Mismatch between numbers of images (%d) and poses (%d)"
        % (len(img_paths), len(cam_paths)))
    n_imgs = len(img_paths)
    ind_vali = np.arange(n_imgs)[:-1:max(1, n_imgs // args.n_vali)]

    vertices, faces = meshio.read_ply(_resolve_mesh_path(args))
    fnormals = raytrace.face_normals(vertices, faces)
    mesh_center = vertices.mean(axis=0)

    # Scene-shifted light sphere, saved since it cannot be regenerated
    # on the fly (surf_from_mvs.py:69-83)
    lxyz, lareas = gen_light_xyz(args.light_h, 2 * args.light_h,
                                 envmap_radius=args.lvis_radius)
    lxyz = lxyz + mesh_center
    lxyz[:, :, 2] = -lxyz[:, :, 2]  # DTU's z-axis is flipped
    np.savez(join(args.outdir, 'lights.npz'),
             lxyzs=lxyz, lareas=lareas)
    lxyz_flat = lxyz.reshape(-1, 3)

    def process(view_name, cam, img=None, nn_img=None):
        outdir = join(args.outdir, view_name)
        os.makedirs(outdir, exist_ok=True)
        ioutil.write_json(
            {'id': view_name, 'imh': cam.imh, 'imw': cam.imw,
             'cam_loc': cam.loc.tolist()}, join(outdir, 'metadata.json'))
        if img is not None:
            ioutil.write_img(img, join(outdir, 'rgba.png'))
        if nn_img is not None:
            ioutil.write_img(nn_img, join(outdir, 'nn.png'))
        alpha, xyz, normal = cast_view(
            cam, vertices, faces, fnormals, spp=args.spp)
        buffers.write_alpha(alpha, outdir)
        buffers.write_xyz(xyz, outdir)
        buffers.write_normal(normal, outdir)
        if not args.skip_lvis:
            lvis = cast_lvis(xyz, alpha, normal, lxyz_flat, vertices,
                             faces, args.lvis_eps)
            buffers.write_lvis(lvis, args.lvis_fps, outdir)

    # ------ Training & validation views
    cams, imgs = [], []
    factor = None
    train_i = vali_i = 0
    for i, (img_path, cam_path) in enumerate(zip(img_paths, cam_paths)):
        img = ioutil.load_img(img_path)
        if factor is None:
            factor = float(img.shape[0]) / args.h
        img_hw_orig = img.shape[:2]
        img = imgops.resize(img, new_h=args.h)
        if img.shape[2] == 3:
            img = np.dstack((img, np.ones_like(img[:, :, :1])))
        cam = _load_view_cam(cam_path, img_hw_orig, factor)
        cams.append(cam)
        imgs.append(img)
        if i in ind_vali:
            view_name = 'val_%03d' % vali_i
            vali_i += 1
        else:
            view_name = 'train_%03d' % train_i
            train_i += 1
        logger.info("Casting %s", view_name)
        process(view_name, cam, img=img)

    # ------ Test trajectory: a lat-lng sweep around the scene center
    cam_locs = np.stack([c.loc for c in cams])
    cam_dist = 1.5 * np.mean(
        np.linalg.norm(cam_locs - mesh_center, axis=1))
    n_test = 4 if args.debug else args.n_test
    lngs = np.linspace(-0.25 * np.pi, 0.5 * np.pi, args.n_test // 2)
    lngs = np.hstack((lngs, np.linspace(
        0.5 * np.pi, -0.25 * np.pi, args.n_test - len(lngs))))[:n_test]
    lats = np.linspace(-0.25 * np.pi, 0, args.n_test)[:n_test]
    K = cams[0].int_mat
    for i, (lat, lng) in enumerate(zip(lats, lngs)):
        loc = cam_dist * np.array([
            np.cos(lat) * np.cos(lng), np.cos(lat) * np.sin(lng),
            np.sin(lat)]) + mesh_center
        cam = camlib.PerspCam.from_lookat(
            K, loc, mesh_center, up=(0, 0, -1),  # DTU up is -z
            imh=cams[0].imh, imw=cams[0].imw)
        nn = imgs[int(np.argmin(
            np.linalg.norm(loc - cam_locs, axis=1)))]
        logger.info("Casting test_%03d", i)
        process('test_%03d' % i, cam, nn_img=nn)
    logger.info("Done: %s", args.outdir)


if __name__ == '__main__':
    main()
