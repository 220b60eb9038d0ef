"""Probe the geometry-distillation loops at flagship (512px) shapes.

Measures, on the real TPU with random NeRF weights (throughput does not
depend on trained values), the sustained wall-clock of

  * compute_light_visibility (the lvis march: dominant stage of the
    published-schedule pipeline, QUALITY.md round 4), and
  * compute_depth_and_normal (the differentiated depth/normal pass),

at the exact shapes tools/quality_e2e.py uses for the 512px from-NeRF
flagship (mlp_width=128, enc_depth=8, n_samples 32/64 -> distillation
96/128, light_h=16 -> 512 dirs, --mlp_chunk 262144).

Usage:
  python -m tools.march_probe [--mlp_chunk 262144] [--n_surf 4096]
"""

import argparse
import time

import numpy as np


def main():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass
    from nerfactor_tpu import models
    from nerfactor_tpu import geometry_from_nerf as geo
    from nerfactor_tpu.utils import config as configutil

    p = argparse.ArgumentParser()
    p.add_argument('--mlp_chunk', type=int, default=262144)
    p.add_argument('--n_surf', type=int, default=4096)
    p.add_argument('--n_rays', type=int, default=16384)
    p.add_argument('--light_h', type=int, default=16)
    p.add_argument('--skip_dn', action='store_true')
    p.add_argument('--pipelined', action='store_true',
                   help="enqueue all lvis block dispatches without "
                        "per-block host sync, then convert once")
    p.add_argument('--profile', action='store_true',
                   help="xplane per-op profile of a few lvis dispatches")
    args = p.parse_args()

    parser = configutil.read_config(
        '/root/repo/nerfactor_tpu/config/nerf.ini')
    for k, v in (('mlp_width', '128'), ('n_samples_coarse', '32'),
                 ('n_samples_fine', '64'), ('near', '2'), ('far', '6'),
                 ('mlp_chunk', str(args.mlp_chunk))):
        parser.set('DEFAULT', k, v)
    config = configutil.Config(parser)
    model = models.get_model_class('nerf')(config)
    params = model.init_params(jax.random.PRNGKey(0))

    gargs = geo.parse_args([
        '--trained_nerf', '/nonexistent', '--out_root', '/nonexistent',
        '--imh', '512', '--light_h', str(args.light_h),
        '--lvis_far', '2.5', '--occu_thres', '0.5',
        '--mlp_chunk', str(args.mlp_chunk)])
    dist = geo.GeometryDistiller(model, params, config, gargs)
    print('n_coarse=%d n_fine=%d ray_block=%d pair_block=%d '
          'lvis_pts_per_block=%d lvis_super_k=%d dn_super_k=%d' % (
              dist.n_coarse, dist.n_fine, dist.ray_block, dist.pair_block,
              dist.lvis_block_pts, dist._lvis_super_k, dist._dn_super_k))

    rng = np.random.default_rng(0)
    # Surface points on a unit sphere with outward normals (matches the
    # flagship scene's geometry regime).
    nrm = rng.normal(size=(args.n_surf, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    surf = nrm * 1.0

    # ---- lvis march ----
    # Warm with one full super of the SAME shape the timed run will
    # dispatch (small warmups would compile only the single-block path)
    lvis_k = dist._eff_super_k(
        args.n_surf, dist.lvis_block_pts, dist._lvis_super_k)
    warm_n = min(args.n_surf, dist.lvis_block_pts * lvis_k)
    # Warm on REVERSED rows: value-identical dispatches are cached by
    # the tunnel (CLAUDE.md), so warming with the timed run's own first
    # super would deflate the timed numbers
    t0 = time.time()
    out = dist.compute_light_visibility(surf[:warm_n][::-1],
                                        nrm[:warm_n][::-1])
    print('lvis warmup/compile: %.1f s' % (time.time() - t0))
    if args.profile:
        import glob
        import json
        import os
        import tempfile
        import jax.numpy as jnp
        block = max(1, dist.pair_block // dist.n_lights)
        sb = jnp.asarray(surf[:block])
        nb = jnp.asarray(nrm[:block])
        dispatches = 4
        tracedir = tempfile.mkdtemp(prefix='marchprof_')
        jax.profiler.start_trace(tracedir)
        o = None
        for _ in range(dispatches):
            o = dist._lvis_block(sb, nb)
        o.block_until_ready()
        jax.profiler.stop_trace()
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
        paths = glob.glob(os.path.join(
            tracedir, 'plugins', 'profile', '*', '*.xplane.pb'))
        assert paths, 'no xplane captured'
        space = xplane_pb2.XSpace()
        space.ParseFromString(open(paths[0], 'rb').read())
        totals = {}
        for plane in space.planes:
            if 'TPU' not in plane.name and 'tpu' not in plane.name:
                continue
            meta = plane.event_metadata
            for line in plane.lines:
                if line.name != 'XLA Ops':
                    continue
                for ev in line.events:
                    name = meta[ev.metadata_id].name
                    totals[name] = totals.get(name, 0.0) \
                        + ev.duration_ps / 1e9
        print(json.dumps({'ms_per_dispatch_device_total':
                          round(sum(totals.values()) / dispatches, 3)}))
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
            print('%8.3f ms/dispatch  %s' % (ms / dispatches, name[:110]))
        return

    if args.pipelined:
        import jax.numpy as jnp
        block = max(1, dist.pair_block // dist.n_lights)
        t0 = time.time()
        outs = []
        for i in range(0, args.n_surf, block):
            sb = surf[i:i + block]
            nb = nrm[i:i + block]
            pad = block - sb.shape[0]
            if pad:
                sb = np.concatenate([sb, np.repeat(sb[-1:], pad, 0)], 0)
                nb = np.concatenate([nb, np.repeat(nb[-1:], pad, 0)], 0)
            outs.append((dist._lvis_block(jnp.asarray(sb),
                                          jnp.asarray(nb)), pad))
        out = np.concatenate(
            [np.asarray(o)[:block - pad] for o, pad in outs], axis=0)
        dt = time.time() - t0
        n_disp = n_blocks = int(np.ceil(args.n_surf / block))
    else:
        t0 = time.time()
        out = dist.compute_light_visibility(surf, nrm)
        dt = time.time() - t0
        # The timed path dispatches SUPERS (lax.map over lvis_k blocks),
        # so ms/dispatch must be derived from the super size, not the
        # block size (round-4 advisor finding)
        sup = dist.lvis_block_pts * lvis_k
        n_disp = max(1, int(np.ceil(args.n_surf / sup)))
        n_blocks = int(np.ceil(args.n_surf / dist.lvis_block_pts))
    print('lvis march: %.2f s per %d pts x %d dirs '
          '(%d dispatches, %.1f ms each; %d blocks, %.1f ms/block; '
          '%.3f ms/pt) checksum=%.4f'
          % (dt, args.n_surf, dist.n_lights, n_disp,
             1e3 * dt / n_disp, n_blocks, 1e3 * dt / n_blocks,
             1e3 * dt / args.n_surf, float(np.mean(out))))
    from tools import perf_ledger
    perf_ledger.append(
        'lvis_march', dt * 4096 / args.n_surf,
        's/4096pts_x_%ddirs' % dist.n_lights,
        config='%s: 128-wide, 96/128 samples, mlp_chunk %d%s' % (
            'flagship 512px shapes' if args.light_h == 16
            else 'light_h=%d' % args.light_h,
            args.mlp_chunk,
            ', pipelined' if args.pipelined else ', super-dispatch'))

    if args.skip_dn:
        return
    # ---- depth/normal pass ----
    rayo = np.tile(np.array([0, 0, 4], np.float32), (args.n_rays, 1))
    rayd = rng.normal(size=(args.n_rays, 3)).astype(np.float32)
    rayd[:, 2] -= 4.0
    dn_k = dist._eff_super_k(args.n_rays, dist.ray_block,
                             dist._dn_super_k)
    warm_n = min(args.n_rays, dist.ray_block * dn_k)
    # Reversed rows again: defeat the tunnel's identical-dispatch cache
    t0 = time.time()
    dist.compute_depth_and_normal(rayo[:warm_n][::-1], rayd[:warm_n][::-1])
    print('depth/normal warmup/compile: %.1f s' % (time.time() - t0))
    t0 = time.time()
    occu, depth, normal = dist.compute_depth_and_normal(rayo, rayd)
    dt = time.time() - t0
    sup = dist.ray_block * dn_k
    n_disp = max(1, int(np.ceil(args.n_rays / sup)))
    n_blocks = int(np.ceil(args.n_rays / dist.ray_block))
    print('depth/normal: %.2f s per %d rays (%d dispatches, %.1f ms '
          'each; %d blocks, %.1f ms/block; %.4f ms/ray) checksum=%.4f'
          % (dt, args.n_rays, n_disp, 1e3 * dt / n_disp, n_blocks,
             1e3 * dt / n_blocks, 1e3 * dt / args.n_rays,
             float(np.mean(depth))))
    from tools import perf_ledger
    perf_ledger.append(
        'depth_normal', dt * 16384 / args.n_rays, 's/16384rays',
        config='flagship 512px shapes: 128-wide, 96/128 samples, '
               'mlp_chunk %d' % args.mlp_chunk)


if __name__ == '__main__':
    main()
