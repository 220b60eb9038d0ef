"""Ad-hoc joint-train-step timer for perf experiments.

Times the flagship NeRFactor joint training step at bench.py's settings
(1024 rays x 512 light directions, 128x4 MLPs) with arbitrary config
overrides, using the only trustworthy method on this TPU tunnel: whole-
run wall clock over chained steps with a final float() transfer
(identical dispatches are cached by the tunnel; see CLAUDE.md).

Usage:
    python -m tools.step_time --override bf16_big_chains=True
    python -m tools.step_time --steps 30 --rays 1024
"""

import argparse
import json
import time

import numpy as np


def _make_nerf_model_and_batch(args):
    """Vanilla NeRF at nerf.ini defaults (256x8, 64+128 samples) with a
    random ray batch."""
    from nerfactor_tpu.models import get_model_class
    from nerfactor_tpu.utils import config as configutil
    parser = configutil.read_config(configutil.resolve_config_path(
        'nerf.ini'))
    overrides = 'n_rays_per_step=%d,near=2,far=6' % args.rays
    if args.override:
        overrides += ',' + args.override
    configutil.apply_override(parser, overrides)
    model = get_model_class('nerf')(configutil.Config(parser))
    rng = np.random.RandomState(0)
    rayd = rng.randn(args.rays, 3).astype(np.float32)
    rayd /= np.linalg.norm(rayd, axis=1, keepdims=True)
    batch = {
        'rayo': np.tile(np.asarray([[0, 0, 4]], np.float32),
                        (args.rays, 1)),
        'rayd': rayd,
        'rgb': rng.rand(args.rays, 3).astype(np.float32),
    }
    return model, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--override', default='',
                    help="comma-separated config overrides")
    ap.add_argument('--model', default='nerfactor',
                    choices=['nerfactor', 'nerf'])
    ap.add_argument('--rays', type=int, default=1024)
    ap.add_argument('--light_h', type=int, default=16)
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--warmup', type=int, default=3)
    ap.add_argument('--scan', type=int, default=0,
                    help="steps per dispatch via lax.scan (0 = one "
                         "dispatch per step)")
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    from __graft_entry__ import _make_model_and_batch
    from nerfactor_tpu.parallel.train import build_optimizer, \
        make_train_step, make_train_step_scan

    if args.model == 'nerf':
        model, batch = _make_nerf_model_and_batch(args)
    else:
        model, batch = _make_model_and_batch(
            n_rays=args.rays, light_h=args.light_h, tiny=False,
            extra_overrides=args.override)
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = build_optimizer(model.config)
    opt_state = optimizer.init(params)
    mask_fn = getattr(model, 'trainable_mask', None)
    mask = mask_fn(params) if mask_fn else None
    if args.scan:
        import jax.numpy as jnp
        inner = make_train_step_scan(
            model, optimizer, trainable_mask=mask, n_steps=args.scan)
        stacked = jax.device_put(jax.tree_util.tree_map(
            lambda x: np.stack([x] * args.scan), batch))

        def train_step(p, s, arrays, key):
            p, s, losses = inner(p, s, stacked, key)
            return p, s, losses[-1]
    else:
        train_step = make_train_step(model, optimizer,
                                     trainable_mask=mask)

    arrays = jax.device_put(batch)
    key = jax.random.PRNGKey(1)
    t_c0 = time.perf_counter()
    for _ in range(args.warmup):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, arrays, sub)
    loss_w = float(loss)
    t_c1 = time.perf_counter()

    t0 = time.perf_counter()
    for _ in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, arrays, sub)
    loss = float(loss)
    dt = time.perf_counter() - t0

    eff_steps = args.steps * max(1, args.scan)
    rays_per_sec = args.rays * eff_steps / dt
    print(json.dumps({
        'override': args.override,
        'scan': args.scan,
        'ms_per_step': round(1e3 * dt / eff_steps, 2),
        'rays_per_sec': round(rays_per_sec, 1),
        'warmup_s': round(t_c1 - t_c0, 1),
        'loss': loss_w if not (loss == loss) else loss,
    }))
    import os
    env_knobs = [k for k in os.environ if k.startswith('NERFACTOR_')]
    shipping_shape = (args.scan == 8 and args.rays == 1024
                      and args.light_h == 16)
    if not args.override and not env_knobs and shipping_shape:
        # Only the SHIPPING configuration feeds the per-stage ledger:
        # scan-8 dispatch at bench.py's shapes. Experiments (overrides,
        # NERFACTOR_* env knobs, other shapes, and scan=0 per-dispatch
        # mode, which carries ~1 ms/step of tunnel overhead real
        # training does not pay) stay out of the round-over-round
        # record.
        from tools import perf_ledger
        cfg = ('nerf.ini scale: %d rays, 64+128 samples, 256x8 MLPs'
               % args.rays) if args.model == 'nerf' else \
              ('%d rays x %d lights, 128x4 MLPs' % (
                  args.rays, 2 * args.light_h ** 2))
        stage = ('joint_step' if args.model == 'nerfactor'
                 else '%s_step' % args.model)  # match bench.py's name
        perf_ledger.append(stage, rays_per_sec, 'rays/sec/chip',
                           config=cfg + ', scan-%d' % args.scan)


if __name__ == '__main__':
    main()
