"""Per-op device profile of the joint train step (bench.py settings).

Captures a jax.profiler trace of a few scan-dispatch steps through the
tunnel, parses the device xplane with ProfileData, and prints the top
ops by total device time -- the measurement behind ROADMAP's kernel
prioritization.

    python -m tools.profile_joint [--steps 3] [--override k=v]
"""

import argparse
import glob
import json
import os
import tempfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--override', default='')
    ap.add_argument('--model', default='nerfactor',
                    choices=['nerfactor', 'nerf'])
    ap.add_argument('--rays', type=int, default=1024)
    ap.add_argument('--light_h', type=int, default=16)
    ap.add_argument('--scan', type=int, default=8)
    ap.add_argument('--dispatches', type=int, default=2)
    ap.add_argument('--top', type=int, default=25)
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    import numpy as np
    from __graft_entry__ import _make_model_and_batch
    from nerfactor_tpu.parallel.train import build_optimizer, \
        make_train_step_scan

    if args.model == 'nerf':
        from tools.step_time import _make_nerf_model_and_batch
        model, batch = _make_nerf_model_and_batch(args)
    else:
        model, batch = _make_model_and_batch(
            n_rays=args.rays, light_h=args.light_h, tiny=False,
            extra_overrides=args.override)
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = build_optimizer(model.config)
    opt_state = optimizer.init(params)
    mask_fn = getattr(model, 'trainable_mask', None)
    step = make_train_step_scan(
        model, optimizer,
        trainable_mask=mask_fn(params) if mask_fn else None,
        n_steps=args.scan)
    stacked = {k: np.broadcast_to(
        v, (args.scan,) + np.asarray(v).shape).copy()
        for k, v in batch.items()}
    arrays = jax.device_put(stacked)
    key = jax.random.PRNGKey(1)
    print('compiling/warmup...', flush=True)
    for _ in range(2):  # warmup/compile
        key, sub = jax.random.split(key)
        params, opt_state, losses = step(params, opt_state, arrays, sub)
    losses.block_until_ready()
    print('warmup done, tracing...', flush=True)

    tracedir = tempfile.mkdtemp(prefix='jointprof_')
    jax.profiler.start_trace(tracedir)
    for _ in range(args.dispatches):
        key, sub = jax.random.split(key)
        params, opt_state, losses = step(params, opt_state, arrays, sub)
    losses.block_until_ready()
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(
        tracedir, 'plugins', 'profile', '*', '*.xplane.pb'))
    assert paths, 'no xplane captured'
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(paths[0], 'rb').read())
    raw = {}
    for plane in space.planes:
        if 'TPU' not in plane.name and 'tpu' not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                name = meta[ev.metadata_id].name
                key = (plane.name, line.name, name)
                raw[key] = raw.get(key, 0.0) + ev.duration_ps / 1e9
    by_line = {}
    for (pl, ln, _), ms in raw.items():
        by_line[(pl, ln)] = by_line.get((pl, ln), 0.0) + ms
    print('lines:', json.dumps(
        {('%s/%s' % k): round(v, 2) for k, v in sorted(
            by_line.items(), key=lambda kv: -kv[1])[:6]}))
    # Aggregate the synchronous per-op line ("XLA Ops"); the async
    # line double-counts overlapping copy waits
    totals = {}
    for (pl, ln, name), ms in raw.items():
        if ln == 'XLA Ops':
            totals[name] = totals.get(name, 0.0) + ms
    assert totals, sorted(by_line)
    n_steps = args.dispatches * args.scan
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:args.top]
    print(json.dumps({'ms_per_step_device_total':
                      round(sum(totals.values()) / n_steps, 3)}))
    for name, ms in rows:
        print('%8.3f ms/step  %s' % (ms / n_steps, name[:110]))


if __name__ == '__main__':
    main()
