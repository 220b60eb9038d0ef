"""Synthetic analytic-sphere scene generator for end-to-end tests.

Produces data laid out exactly like the reference's Blender renders
(data_gen/nerf_synth/render.py outputs): per-view dirs '<mode>_???' with
metadata.json (cam_transform_mat, cam_angle_x, imh, imw) + rgba.png, plus
optionally the distilled-geometry buffers (xyz.npy, normal.npy, lvis.npy,
alpha.png) that geometry_from_nerf would produce -- computed analytically
from the sphere, so shape/nerfactor stages can be tested without a
trained NeRF.
"""

import json
import os
from os.path import join

import numpy as np

from nerfactor_tpu.ops.light import gen_light_xyz
from nerfactor_tpu.utils import io as ioutil

SPHERE_R = 0.8
CAM_DIST = 4.0
ANGLE_X = 0.6911112070083618  # matches the synthetic NeRF scenes


def look_at_c2w(cam_loc, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)):
    """Camera-to-world with the Blender/NeRF convention: camera x right,
    y up, z backward (rays go through -z)."""
    cam_loc = np.asarray(cam_loc, float)
    fwd = np.asarray(target, float) - cam_loc
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, float))
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -fwd
    c2w[:3, 3] = cam_loc
    return c2w


def ring_cameras(n, elev_deg=30.0, dist=CAM_DIST, phase=0.0):
    cams = []
    for i in range(n):
        az = phase + 2 * np.pi * i / n
        el = np.deg2rad(elev_deg)
        loc = dist * np.array([
            np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)])
        cams.append(look_at_c2w(loc))
    return cams


def gen_rays(c2w, imh, imw, angle_x=ANGLE_X):
    xs = np.linspace(0, imw, imw, endpoint=False)
    ys = np.linspace(0, imh, imh, endpoint=False)
    xs, ys = np.meshgrid(xs, ys)
    fl = 0.5 * imw / np.tan(0.5 * angle_x)
    rayd_local = np.stack(
        ((xs - 0.5 * imw) / fl, -(ys - 0.5 * imh) / fl, -np.ones_like(xs)),
        axis=-1)
    rayd = np.sum(rayd_local[:, :, None, :] * c2w[:3, :3], axis=-1)
    rayo = np.tile(c2w[:3, 3][None, None, :], (imh, imw, 1))
    return rayo, rayd


def ray_sphere(rayo, rayd, r=SPHERE_R):
    """Returns (hit mask, first-hit t) for unit-normalized directions."""
    d = rayd / np.linalg.norm(rayd, axis=-1, keepdims=True)
    b = np.sum(rayo * d, axis=-1)
    c = np.sum(rayo * rayo, axis=-1) - r ** 2
    disc = b ** 2 - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0
    return hit, t, d


def shade(xyz, normal, albedo_rgb=(0.6, 0.3, 0.2), light_dir=(0.5, 0.5, 1)):
    l = np.asarray(light_dir, float)
    l /= np.linalg.norm(l)
    lambert = np.clip(normal @ l, 0, 1)
    ambient = 0.25
    rgb = np.asarray(albedo_rgb)[None, None, :] * (
        ambient + (1 - ambient) * lambert[..., None])
    return np.clip(rgb, 0, 1)


def sphere_lvis(xyz, normal, light_h=4):
    """Exact light visibility of a convex sphere: front-lit = visible."""
    lxyz, _ = gen_light_xyz(light_h, 2 * light_h)
    lxyz_flat = lxyz.reshape(-1, 3)
    surf2l = lxyz_flat[None, None, :, :] - xyz[:, :, None, :]
    surf2l /= np.linalg.norm(surf2l, axis=-1, keepdims=True)
    cos = np.einsum('hwlc,hwc->hwl', surf2l, normal)
    return (cos > 0).astype(np.float32)


def write_view(view_dir, c2w, imh, imw, with_rgba=True, light_h=4,
               with_buffers=False, nerf_root=None, view_id=None):
    os.makedirs(view_dir, exist_ok=True)
    metadata = {
        'cam_transform_mat': ','.join(str(x) for x in c2w.ravel()),
        'cam_angle_x': ANGLE_X,
        'imh': imh, 'imw': imw, 'spp': 1,
        'scene': 'synth_sphere', 'split': os.path.basename(view_dir),
    }
    with open(join(view_dir, 'metadata.json'), 'w') as h:
        json.dump(metadata, h)
    rayo, rayd = gen_rays(c2w, imh, imw)
    hit, t, d = ray_sphere(rayo, rayd)
    xyz = rayo + d * t[..., None]
    xyz[~hit] = 0.0
    normal = xyz / max(SPHERE_R, 1e-8)
    normal[~hit] = np.array([0.0, 1.0, 0.0])
    alpha = hit.astype(np.float32)
    if with_rgba:
        rgb = shade(xyz, normal)
        rgb[~hit] = 0.0
        rgba = np.dstack([rgb, alpha])
        ioutil.write_img(rgba, join(view_dir, 'rgba.png'))
        # Ground-truth albedo for test.py's color correction path
        albedo = np.zeros_like(rgb)
        albedo[hit] = (0.6, 0.3, 0.2)
        ioutil.write_img(np.dstack([albedo ** (1 / 2.2), alpha]),
                         join(view_dir, 'albedo.png'))
    if with_buffers:
        buf_dir = join(nerf_root, view_id)
        os.makedirs(buf_dir, exist_ok=True)
        ioutil.save_np(xyz.astype(np.float32), join(buf_dir, 'xyz.npy'))
        ioutil.save_np(normal.astype(np.float32),
                       join(buf_dir, 'normal.npy'))
        lvis = sphere_lvis(xyz, normal, light_h=light_h)
        lvis[~hit] = 0.0
        ioutil.save_np(lvis, join(buf_dir, 'lvis.npy'))
        ioutil.write_img(alpha, join(buf_dir, 'alpha.png'))


def make_scene(root, n_train=4, n_vali=2, n_test=2, imh=16,
               with_buffers=False, nerf_root=None, light_h=4):
    """Builds a full synthetic scene; returns (root, nerf_root)."""
    if with_buffers and nerf_root is None:
        nerf_root = join(root, 'surf')
    specs = [('train', n_train, 10.0), ('val', n_vali, 40.0),
             ('test', n_test, 70.0)]
    for mode, n, phase_deg in specs:
        cams = ring_cameras(n, phase=np.deg2rad(phase_deg))
        for i, c2w in enumerate(cams):
            vid = '%s_%03d' % (mode, i)
            write_view(
                join(root, vid), c2w, imh, imh,
                with_rgba=(mode != 'test'), light_h=light_h,
                with_buffers=with_buffers, nerf_root=nerf_root, view_id=vid)
    return root, nerf_root
