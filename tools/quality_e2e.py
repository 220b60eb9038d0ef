"""End-to-end quality harness on the analytic-sphere scene: trains the
BRDF prior, the shape stage, and the joint NeRFactor model for real
(hundreds of epochs, not smoke-test lengths), then reports the
validation PSNR of the joint model's re-rendered views.

No released NeRFactor scene ships in this environment, so this is the
quality anchor: the sphere's shading is exactly representable
(Lambertian + achromatic specular under an environment light), so a
correct implementation should reach high PSNR.

  python -m tools.quality_e2e --workdir=/tmp/quality [--imh=32]
      [--light_h=8] [--epochs_shape=100] [--epochs_joint=150]
"""

import argparse
import json
import os
import sys
import time
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--workdir', required=True)
    p.add_argument('--imh', type=int, default=32)
    p.add_argument('--light_h', type=int, default=8)
    p.add_argument('--n_train', type=int, default=8)
    p.add_argument('--epochs_brdf', type=int, default=200)
    p.add_argument('--epochs_shape', type=int, default=100)
    p.add_argument('--epochs_joint', type=int, default=150)
    p.add_argument('--mlp_width', type=int, default=64)
    p.add_argument('--n_rays', type=int, default=512)
    p.add_argument('--from_nerf', action='store_true',
                   help="run the REAL pipeline front: train a NeRF, "
                        "distill its geometry (geometry_from_nerf), and "
                        "feed the distilled (noisy) buffers downstream "
                        "instead of the analytic ones")
    p.add_argument('--epochs_nerf', type=int, default=600)
    p.add_argument('--distill_mlp_chunk', type=int, default=262144,
                   help="geometry_from_nerf --mlp_chunk (the published-"
                        "schedule ledger runs use 1048576)")
    p.add_argument('--extra_override', default='',
                   help="extra config overrides for the shape + joint "
                        "stages (e.g. bf16_big_chains=True)")
    p.add_argument('--n_materials', type=int, default=2,
                   help="synthetic BRDF-table materials for the prior "
                        "(>=20 to mirror the reference's hardcoded "
                        "20-identity interpolation sweep)")
    return p.parse_args(argv)


def main(argv=None):
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    args = parse_args(argv)
    from tests import synth
    from nerfactor_tpu import trainvali
    from nerfactor_tpu.utils import io as ioutil

    wk = args.workdir
    root = join(wk, 'data')
    out = join(wk, 'out')
    if not os.path.exists(join(root, 'train_000')):
        synth.make_scene(root, n_train=args.n_train, n_vali=2, n_test=3,
                         imh=args.imh, with_buffers=True,
                         light_h=args.light_h)
    # Light probes (for the test driver; not needed for PSNR)
    probe_dir = join(root, 'envmaps')
    os.makedirs(probe_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for name in ('probeA', 'probeB'):
        ioutil.save_np(
            rng.rand(args.light_h, 2 * args.light_h, 3).astype(
                np.float32), join(probe_dir, name + '.npy'))
    # Synthetic "MERL" tables: two near-constant materials, so the prior
    # learns a low-dim specular family
    brdf_data = join(root, 'brdf_npz')
    os.makedirs(brdf_data, exist_ok=True)
    grid = np.stack(np.meshgrid(
        np.linspace(0, np.pi, 18), np.linspace(0, np.pi / 2, 9),
        np.linspace(0, np.pi / 2, 9), indexing='ij'), -1).reshape(-1, 3)
    if args.n_materials == 2:
        materials = (('matte', 0.05), ('shiny', 0.6))
    else:
        materials = tuple(
            ('mat%02d' % i, v) for i, v in enumerate(
                np.linspace(0.05, 0.6, args.n_materials)))
    for i, (name, val) in enumerate(materials):
        refl = val * np.ones((grid.shape[0], 1), np.float32)
        for mode in ('train', 'vali'):
            np.savez(join(brdf_data, '%s_%s.npz' % (mode, name)),
                     i=i, name=name, envmap_h=args.light_h, ims=64,
                     spp=1, rusink=grid.astype(np.float32), refl=refl)
    np.savez(join(brdf_data, 'test.npz'), envmap_h=args.light_h, ims=64,
             spp=1, rusink=grid.astype(np.float32))

    mlp = ('mlp_width=%d,mlp_depth=4,mlp_skip_at=2,mlp_chunk=65536'
           % args.mlp_width)

    # ------ Optional stage 0: NeRF + geometry distillation
    stage_walls = {}  # stage -> wall-clock seconds

    def staged(name):
        class _T:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *exc):
                stage_walls[name] = time.time() - self.t0
        return _T()

    surf_root = join(root, 'surf')
    if args.from_nerf:
        from nerfactor_tpu import geometry_from_nerf
        nerf_out = join(out, 'nerf')
        with staged('nerf'):
            trainvali.main([
                '--config', 'nerf.ini', '--config_override',
                        ','.join([
                            'data_root=%s' % root, 'outroot=%s' % nerf_out,
                            'imh=%d' % args.imh,
                            'epochs=%d' % args.epochs_nerf,
                            'ckpt_period=%d' % args.epochs_nerf,
                            'vali_period=%d' % args.epochs_nerf,
                            'vali_batches=1',
                            'n_rays_per_step=%d' % args.n_rays,
                            'n_samples_coarse=32', 'n_samples_fine=64',
                            'near=2', 'far=6', mlp, 'lr=5e-4']
                        + ([args.extra_override]
                           if args.extra_override else []))])
        surf_root = join(out, 'surf_from_nerf')
        with staged('distill'):
            geometry_from_nerf.main([
                '--trained_nerf', join(nerf_out, 'lr5e-4'),
                '--out_root', surf_root,
                '--imh', str(args.imh), '--light_h', str(args.light_h),
                '--lvis_far', '2.5', '--occu_thres', '0.5',
                '--mlp_chunk', str(args.distill_mlp_chunk)])

    # ------ Stage 1: BRDF prior
    brdf_out = join(out, 'merl')
    with staged('brdf'):
        trainvali.main([
            '--config', 'brdf.ini', '--config_override', ','.join([
        'data_root=%s' % brdf_data, 'outroot=%s' % brdf_out,
        'epochs=%d' % args.epochs_brdf,
        'ckpt_period=%d' % args.epochs_brdf,
        'vali_period=%d' % args.epochs_brdf, 'vali_batches=1',
        'n_rays_per_step=512', mlp, 'lr=1e-2'])])
    brdf_ckpt = join(brdf_out, 'lr1e-2', 'checkpoints',
                     'ckpt-%d' % args.epochs_brdf)

    # ------ Stage 2: shape distillation
    shape_out = join(out, 'shape')
    with staged('shape'):
        trainvali.main([
            '--config', 'shape.ini', '--config_override',
                    ','.join([
                        'data_root=%s' % root,
                        'data_nerf_root=%s' % surf_root,
                        'outroot=%s' % shape_out,
                        'imh=%d' % args.imh, 'light_h=%d' % args.light_h,
                        'epochs=%d' % args.epochs_shape,
                        'ckpt_period=%d' % args.epochs_shape,
                        'vali_period=%d' % args.epochs_shape,
                        'vali_batches=1',
                        'n_rays_per_step=%d' % args.n_rays, mlp,
                        'lr=1e-2'] + ([args.extra_override]
                                      if args.extra_override else []))])
    shape_ckpt = join(shape_out, 'lr1e-2', 'checkpoints',
                      'ckpt-%d' % args.epochs_shape)

    # ------ Stage 3: joint optimization
    joint_out = join(out, 'nerfactor')
    with staged('joint'):
        trainvali.main([
            '--config', 'nerfactor.ini', '--config_override',
                    ','.join([
                        'data_root=%s' % root,
                        'data_nerf_root=%s' % surf_root,
                        'outroot=%s' % joint_out,
                        'brdf_model_ckpt=%s' % brdf_ckpt,
                        'shape_model_ckpt=%s' % shape_ckpt,
                        'test_envmap_dir=%s' % probe_dir,
                        'imh=%d' % args.imh, 'light_h=%d' % args.light_h,
                        'epochs=%d' % args.epochs_joint,
                        'ckpt_period=%d' % args.epochs_joint,
                        'vali_period=%d' % args.epochs_joint,
                        'vali_batches=2',
                        'n_rays_per_step=%d' % args.n_rays, mlp,
                        'lr=5e-3'] + ([args.extra_override]
                                      if args.extra_override else []))])

    # ------ Report
    vali_dir = join(joint_out, 'lr5e-3', 'vis_vali')
    epochs = sorted(os.listdir(vali_dir))
    psnrs = []
    for batch_dir in sorted(os.listdir(join(vali_dir, epochs[-1]))):
        meta_path = join(vali_dir, epochs[-1], batch_dir,
                         'metadata.json')
        if os.path.isfile(meta_path):
            with open(meta_path) as h:
                meta = json.load(h)
            if 'psnr' in meta:
                psnrs.append((meta['id'], meta['psnr']))
    walls = {k: round(v / 60.0, 2) for k, v in stage_walls.items()}
    total_min = round(sum(stage_walls.values()) / 60.0, 2)
    print(json.dumps({'per_view_psnr': psnrs,
                      'mean_psnr': float(np.mean([p for _, p in psnrs]))
                      if psnrs else None,
                      'stage_walls_min': walls,
                      'total_min': total_min}))
    from tools import perf_ledger
    cfg = ('imh=%d light_h=%d mlp_width=%d n_rays=%d%s epochs=%s' % (
        args.imh, args.light_h, args.mlp_width, args.n_rays,
        ' from_nerf(nerf=%d)' % args.epochs_nerf if args.from_nerf
        else '',
        '%d/%d/%d' % (args.epochs_brdf, args.epochs_shape,
                      args.epochs_joint)))
    perf_ledger.append('pipeline_e2e', total_min, 'min', config=cfg,
                       stage_walls_min=walls)
    if 'distill' in stage_walls:
        perf_ledger.append('distill_stage', walls['distill'], 'min',
                           config=cfg)


if __name__ == '__main__':
    main()
