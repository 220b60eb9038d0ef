"""DTU MVS ingestion stack: PLY IO, projection decomposition, the JAX
ray-mesh intersector, and the two DTU drivers end-to-end on a synthetic
icosphere scene."""

import os
from os.path import join, exists

import numpy as np
import pytest

from data_gen_tpu import camera as camlib, meshio, raytrace
from nerfactor_tpu.utils import io as ioutil


def icosphere(r=1.0, subdiv=1):
    """Small triangulated sphere (icosahedron + midpoint subdivision)."""
    t = (1 + np.sqrt(5)) / 2
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], int)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    for _ in range(subdiv):
        new_faces, mids, vlist = [], {}, list(verts)

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in mids:
                m = (vlist[i] + vlist[j]) / 2
                m = m / np.linalg.norm(m)
                mids[key] = len(vlist)
                vlist.append(m)
            return mids[key]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        verts = np.stack(vlist)
        faces = np.array(new_faces, int)
    return (r * verts).astype(np.float32), faces.astype(np.int64)


# ------ Ray-mesh intersection ------

def test_raytrace_sphere_oracle():
    verts, faces = icosphere(r=1.0, subdiv=2)
    rng = np.random.RandomState(0)
    # Rays from outside toward the center must hit near the sphere
    origs = rng.randn(64, 3)
    origs = 5.0 * origs / np.linalg.norm(origs, axis=1, keepdims=True)
    dirs = -origs / np.linalg.norm(origs, axis=1, keepdims=True)
    hit, t, tri = raytrace.intersect(origs, dirs, verts, faces)
    assert hit.all()
    # First hit distance ~ 4 (5 - sphere radius); icosphere is inscribed
    assert (np.abs(t - 4.0) < 0.15).all()
    assert (tri >= 0).all() and (tri < len(faces)).all()
    # Rays pointing away must miss
    hit_away, t_away, _ = raytrace.intersect(origs, -dirs, verts, faces)
    assert not hit_away.any() and np.isinf(t_away).all()


def test_raytrace_face_normals_outward():
    verts, faces = icosphere(subdiv=1)
    n = raytrace.face_normals(verts, faces)
    centers = verts[faces].mean(axis=1)
    cos = np.einsum('fc,fc->f', n, centers / np.linalg.norm(
        centers, axis=1, keepdims=True))
    assert (cos > 0.8).all(), "Face normals must point outward"


# ------ PLY IO ------

def test_ply_roundtrip_ascii(tmp_path):
    verts, faces = icosphere(subdiv=0)
    path = str(tmp_path / 'mesh.ply')
    meshio.write_ply(path, verts, faces)
    v2, f2 = meshio.read_ply(path)
    np.testing.assert_allclose(v2, verts, rtol=1e-5)
    np.testing.assert_array_equal(f2, faces)


def test_ply_binary(tmp_path):
    verts, faces = icosphere(subdiv=0)
    path = str(tmp_path / 'mesh_bin.ply')
    with open(path, 'wb') as h:
        h.write(b'ply\nformat binary_little_endian 1.0\n')
        h.write(b'element vertex %d\n' % len(verts))
        h.write(b'property float x\nproperty float y\nproperty float z\n')
        h.write(b'element face %d\n' % len(faces))
        h.write(b'property list uchar int vertex_indices\n')
        h.write(b'end_header\n')
        h.write(verts.astype('<f4').tobytes())
        for f in faces:
            h.write(np.uint8(3).tobytes())
            h.write(f.astype('<i4').tobytes())
    v2, f2 = meshio.read_ply(path)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)
    np.testing.assert_array_equal(f2, faces)


# ------ Camera ------

def test_decompose_projection_roundtrip():
    rng = np.random.RandomState(3)
    K = np.array([[120.0, 0, 64], [0, 118.0, 48], [0, 0, 1]])
    # Random proper rotation
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    R = q.T
    c = rng.randn(3) * 2
    t = -R @ c
    P = K @ np.concatenate([R, t[:, None]], axis=1)
    K2, R2, c2 = camlib.decompose_projection(3.7 * P)  # scale-invariant
    np.testing.assert_allclose(K2, K, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(R2, R, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(c2, c, rtol=1e-5, atol=1e-6)


def test_persp_cam_rays_hit_lookat():
    K = np.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]])
    cam = camlib.PerspCam.from_lookat(
        K, loc=(0, -4, 0), lookat=(0, 0, 0), imh=24, imw=32)
    rays = cam.gen_rays()
    assert rays.shape == (24, 12 if False else 32, 1, 3)[0:1] + (32, 1, 3)
    # Central pixel's ray points at the look-at target
    center = rays[12, 16, 0]
    center = center / np.linalg.norm(center)
    np.testing.assert_allclose(center, [0, 1, 0], atol=0.05)


# ------ DTU drivers end-to-end ------

@pytest.fixture(scope='module')
def dtu_scene(tmp_path_factory):
    """Synthetic 'scan' with DTU-style cameras + mesh, centered off
    origin like real DTU scenes."""
    root = str(tmp_path_factory.mktemp('dtu'))
    center = np.array([10.0, -5.0, 3.0])
    verts, faces = icosphere(r=2.0, subdiv=2)
    verts = verts + center
    cam_dir = join(root, 'cams')
    img_dir = join(root, 'scan42')
    surf_dir = join(root, 'stl')
    for d in (cam_dir, img_dir, surf_dir):
        os.makedirs(d)
    meshio.write_ply(join(surf_dir, 'stl042_l3_surf_11_trim_8.ply'),
                     verts, faces)
    K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
    rng = np.random.RandomState(0)
    for i in range(4):
        az = 2 * np.pi * i / 4
        loc = center + 8.0 * np.array(
            [np.cos(az), np.sin(az), -0.5])  # DTU up is -z
        cam = camlib.PerspCam.from_lookat(K, loc, center, up=(0, 0, -1),
                                          imh=64, imw=64)
        P = K @ cam.ext_mat
        np.savetxt(join(cam_dir, 'pos_%03d.txt' % (i + 1)), P)
        ioutil.write_img(rng.rand(64, 64, 3).astype(np.float32),
                         join(img_dir, 'rect_%03d_3_r5000.png' % (i + 1)))
    return {'cam_dir': cam_dir, 'img_dir': img_dir, 'surf_dir': surf_dir,
            'center': center}


def test_dtu_surf_from_mvs(dtu_scene, tmp_path_factory):
    out = str(tmp_path_factory.mktemp('dtu_surf'))
    from data_gen_tpu import dtu_surf_from_mvs
    dtu_surf_from_mvs.main([
        '--cam_dir', dtu_scene['cam_dir'],
        '--img_dir', dtu_scene['img_dir'],
        '--surf_dir', dtu_scene['surf_dir'],
        '--outdir', out, '--h', '32', '--light_h', '4', '--n_vali', '2',
        '--n_test', '2', '--lvis_eps', '0.05'])
    lights = np.load(join(out, 'lights.npz'))
    assert lights['lxyzs'].shape == (4, 8, 3)
    # Light sphere is shifted to the scene center
    assert np.linalg.norm(
        lights['lxyzs'].reshape(-1, 3).mean(0)
        - dtu_scene['center'] * np.array([1, 1, -1])) < 2e5
    views = (ioutil.sortglob(out, 'train_???')
             + ioutil.sortglob(out, 'val_???'))
    assert len(views) == 4
    for v in views[:1]:
        for f in ('metadata.json', 'rgba.png', 'alpha.png', 'xyz.npy',
                  'normal.npy', 'lvis.npy'):
            assert exists(join(v, f)), "Missing %s" % f
        alpha = ioutil.load_img(join(v, 'alpha.png'))
        assert alpha[16, 16] > 0.9, "Sphere center must be foreground"
        assert alpha[0, 0] < 0.1, "Corner must be background"
        xyz = ioutil.load_np(join(v, 'xyz.npy'))
        fg = alpha > 0.5
        d = np.linalg.norm(xyz[fg] - dtu_scene['center'], axis=-1)
        assert (np.abs(d - 2.0) < 0.2).all(), "Hits must lie on the sphere"
        normal = ioutil.load_np(join(v, 'normal.npy'))
        outward = (xyz[fg] - dtu_scene['center']) / d[:, None]
        cos = np.einsum('nc,nc->n', normal[fg], outward)
        assert cos.mean() > 0.9, "Normals must point outward"
        lvis = ioutil.load_np(join(v, 'lvis.npy'))
        assert lvis.shape[2] == 32
        assert (lvis[~fg] == 0).all()
    # Test trajectory with nearest-neighbor reference
    tests = ioutil.sortglob(out, 'test_???')
    assert len(tests) == 2 and exists(join(tests[0], 'nn.png'))


def test_dtu_feeds_shape_mvs_stage(dtu_scene, tmp_path_factory):
    """The DTU surf output must train the MVS shape stage end-to-end
    (mvs_shape dataset + lights.npz + xyz_scale path)."""
    import json
    surf = str(tmp_path_factory.mktemp('dtu_surf2'))
    out = str(tmp_path_factory.mktemp('dtu_shape_out'))
    from data_gen_tpu import dtu_surf_from_mvs
    dtu_surf_from_mvs.main([
        '--cam_dir', dtu_scene['cam_dir'],
        '--img_dir', dtu_scene['img_dir'],
        '--surf_dir', dtu_scene['surf_dir'],
        '--outdir', surf, '--h', '16', '--light_h', '2', '--n_vali', '1',
        '--n_test', '1', '--lvis_eps', '0.05'])
    from nerfactor_tpu import trainvali
    override = ','.join([
        'mvs_root=%s' % surf, 'outroot=%s' % out,
        'imh=16', 'epochs=4', 'ckpt_period=2', 'vali_period=4',
        'vali_batches=1', 'n_rays_per_step=64',
        'mlp_width=16', 'mlp_depth=2', 'mlp_skip_at=1', 'mlp_chunk=2048',
        'xyz_scale=0.1', 'lr=1e-2'])
    trainvali.main(['--config', 'shape_mvs.ini',
                    '--config_override', override])
    outdir = join(out, 'lr1e-2')
    with open(join(outdir, 'summary_train', 'scalars.jsonl')) as h:
        recs = [json.loads(line) for line in h]
    losses = [r['loss_train'] for r in recs if 'loss_train' in r]
    assert losses and np.isfinite(losses).all()
    assert exists(join(outdir, 'checkpoints', 'ckpt-4.npz'))


def test_dtu_make_dataset(dtu_scene, tmp_path_factory):
    scene_dir = str(tmp_path_factory.mktemp('dtu_scan'))
    img_dir = join(scene_dir, 'image')
    os.makedirs(img_dir)
    K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
    center = dtu_scene['center']
    cams = {}
    rng = np.random.RandomState(1)
    scale_mat = np.eye(4)
    scale_mat[:3, :3] *= 4.0
    scale_mat[:3, 3] = center
    for i in range(5):
        az = 2 * np.pi * i / 5 + 0.3
        loc = center + 8.0 * np.array(
            [np.cos(az) * 0.9, np.sin(az) * 0.9, -0.45])
        cam = camlib.PerspCam.from_lookat(K, loc, center, up=(0, 0, -1),
                                          imh=64, imw=64)
        P34 = K @ cam.ext_mat
        world_mat = np.eye(4)
        world_mat[:3] = P34
        cams['world_mat_%d' % i] = world_mat
        cams['scale_mat_%d' % i] = scale_mat
        ioutil.write_img(rng.rand(64, 64, 3).astype(np.float32),
                         join(img_dir, '%06d.png' % i))
    np.savez(join(scene_dir, 'cameras.npz'), **cams)
    out = str(tmp_path_factory.mktemp('dtu_out'))
    from data_gen_tpu import dtu_make_dataset
    dtu_make_dataset.main(['--scene_dir', scene_dir, '--outroot', out,
                           '--h', '32', '--n_vali', '2'])
    assert len(ioutil.sortglob(out, 'train_???')) == 3
    assert len(ioutil.sortglob(out, 'val_???')) == 2
    assert len(ioutil.sortglob(out, 'test_???')) == 120
    meta = ioutil.read_json(
        join(out, 'train_000', 'metadata.json'))
    mat = np.array([float(x) for x in
                    meta['cam_transform_mat'].split(',')]).reshape(4, 4)
    # Spherified: cameras near the unit sphere
    assert abs(np.linalg.norm(mat[:3, 3]) - 1.0) < 0.3


def test_decompose_projection_matches_cv2():
    """Our RQ-based decomposition == cv2.decomposeProjectionMatrix
    (what the reference raw-DTU path uses,
    make_dataset_from_raw.py:71)."""
    cv2 = pytest.importorskip('cv2')
    rng = np.random.RandomState(11)
    for _ in range(5):
        K = np.array([[100 + 30 * rng.rand(), 0, 64 * rng.rand()],
                      [0, 100 + 30 * rng.rand(), 48 * rng.rand()],
                      [0, 0, 1.0]])
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        R = q.T
        c = rng.randn(3) * 3
        P = K @ np.concatenate([R, (-R @ c)[:, None]], axis=1)
        K_cv = cv2.decomposeProjectionMatrix(P)[0]
        K_cv = K_cv / K_cv[2, 2]
        K_ours, _, _ = camlib.decompose_projection(P)
        np.testing.assert_allclose(K_ours, K_cv, rtol=1e-6, atol=1e-6)


def test_dtu_make_dataset_from_raw(tmp_path_factory):
    """Raw pos_???.txt + rectified images -> per-view layout
    (reference data_gen/dtu_mvs/make_dataset_from_raw.py)."""
    base = str(tmp_path_factory.mktemp('dtu_raw'))
    cam_dir = join(base, 'cal')
    img_dir = join(base, 'imgs', 'scan1')
    os.makedirs(cam_dir)
    os.makedirs(img_dir)
    K = np.array([[120.0, 0, 32], [0, 120.0, 32], [0, 0, 1]])
    center = np.array([0.0, 0.0, 5.0])
    rng = np.random.RandomState(2)
    for i in range(6):
        az = 2 * np.pi * i / 6 + 0.2
        loc = center + 6.0 * np.array(
            [np.cos(az) * 0.9, np.sin(az) * 0.9, -0.45])
        cam = camlib.PerspCam.from_lookat(K, loc, center, up=(0, 0, -1),
                                          imh=64, imw=64)
        np.savetxt(join(cam_dir, 'pos_%03d.txt' % (i + 1)),
                   K @ cam.ext_mat)
        # Name pattern: the reference globs the most diffuse lighting
        # condition '*_3_*'
        ioutil.write_img(rng.rand(64, 64, 3).astype(np.float32),
                         join(img_dir, 'rect_%03d_3_r5000.png' % (i + 1)))
        # Decoys under other lighting conditions must be ignored
        ioutil.write_img(np.zeros((64, 64, 3), np.float32),
                         join(img_dir, 'rect_%03d_5_r5000.png' % (i + 1)))
    out = str(tmp_path_factory.mktemp('dtu_raw_out'))
    from data_gen_tpu import dtu_make_dataset_from_raw
    dtu_make_dataset_from_raw.main([
        '--cam_dir', cam_dir, '--img_root', join(base, 'imgs'),
        '--scenes', 'scan1', '--outroot', out, '--h', '32',
        '--n_vali', '2'])
    scene_out = join(out, 'scan1')
    assert len(ioutil.sortglob(scene_out, 'train_???')) == 4
    assert len(ioutil.sortglob(scene_out, 'val_???')) == 2
    assert len(ioutil.sortglob(scene_out, 'test_???')) == 120
    meta = ioutil.read_json(join(scene_out, 'train_000', 'metadata.json'))
    assert meta['imh'] == 32 and meta['imw'] == 32
    mat = np.array([float(x) for x in
                    meta['cam_transform_mat'].split(',')]).reshape(4, 4)
    assert abs(np.linalg.norm(mat[:3, 3]) - 1.0) < 0.3
    # rgba with the all-one alpha appended
    img = ioutil.load_img(join(scene_out, 'train_000', 'rgba.png'))
    assert img.shape == (32, 32, 4)
    assert img[:, :, 3].min() > 0.99
    # Skip-if-done guard
    dtu_make_dataset_from_raw.main([
        '--cam_dir', cam_dir, '--img_root', join(base, 'imgs'),
        '--scenes', 'scan1', '--outroot', out, '--h', '32',
        '--n_vali', '2'])
