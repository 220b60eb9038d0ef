"""TPU-side verification of the fused dir2rusink->BRDF-chain kernel
(ops/pallas_rusink.py) at the joint model's real plan/scale (VERDICT
round 1, item 2).

Baseline choice matters: the program the fusion replaces is the
SHIPPING unfused path -- XLA ``ops/geom.dir2rusink`` feeding the Pallas
chain kernel (``fused_rusink=False, fused_mlp=True``) -- so every
comparison is fused-vs-shipping, with the f32 XLA reference
(``pallas_rusink.reference``) reported only as the bf16 noise floor.
Comparing the fused kernel against the f32 reference directly conflates
the rusink fusion with the chain's own bf16 MXU noise (measured ~5.7%
max on softplus outputs), which both paths share identically.

Checks:

1. forward parity fused-vs-shipping at N = rays x lights scale;
2. analytic input gradients: the hand-derived safe-VJP vs the XLA
   autodiff through dir2rusink + the (identical) Pallas chain
   backward, reported as p50/p99/max relative to the mean grad
   magnitude. p50/p99 land at f32 round-off (<=1e-5); the max is
   dominated by single rows whose ReLU activation pattern flips
   under bf16 forward noise (the shipping-vs-f32 floor shows the
   same magnitudes).
3. finite differences, f32 kernels only (KERNEL_MATMUL_DTYPE=None):
   per-probe central difference quotients THROUGH THE FUSED path vs
   the SAME quotients through the shipping path. Note plain
   fd-vs-analytic is NOT a valid check at this plan scale, for the
   XLA path just as much as for the kernel: at any usable eps the
   128x4 ReLU chain crosses kinks and the mod-pi phi_d wrap inside
   the stencil, so the quotient measures an average slope, not the
   derivative (measured: 27/36 probes "fail" fd-vs-autodiff on the
   pure-XLA f32 reference itself). Matching the two paths' quotients
   probe-for-probe instead validates that the kernel computes the
   same loss landscape at finite offsets -- strictly stronger than
   single-point agreement, and immune to the kink problem.
4. degenerate directions (l==v, l==-v, poles) produce finite grads
   on real TPU (the safe-gradient clip semantics, ops/math.py).
5. wall-clock fused vs shipping fwd+bwd (whole-run, chained
   dispatches, terminal block_until_ready -- the only trustworthy
   timing through the tunnel).

CPU-side complements (tests/test_pallas_rusink.py, interpret mode):
forward + gradient oracles vs jax.grad of the reference in f32.

Run: python -m tools.verify_rusink_kernel [--n 524288] [--probes 36]
"""

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--n', type=int, default=524288,
                   help="rows (default 1024 rays x 512 lights)")
    p.add_argument('--probes', type=int, default=36)
    p.add_argument('--fd_eps', type=float, default=1e-2)
    p.add_argument('--reps', type=int, default=30)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass
    from nerfactor_tpu.ops import geom as geomops
    from nerfactor_tpu.ops import pallas_mlp as pm
    from nerfactor_tpu.ops import pallas_rusink as pr

    # The joint model's real BRDF plan: z(3) ++ posenc(rusink, 2
    # octaves), 128x4 skip@2, softplus head (models/nerfactor.py:219)
    z_dim, width, depth = 3, 128, 4
    plan = pm.make_plan(
        [(z_dim, 0), (3, 2)], (width,) * depth + (1,),
        ('relu',) * depth + ('softplus',), (2,))
    rng = np.random.RandomState(0)
    dims = pm.layer_in_dims(plan)
    params = tuple(
        (jnp.asarray(rng.randn(dims[i], w) * 0.3, jnp.float32),
         jnp.asarray(rng.randn(w) * 0.05, jnp.float32))
        for i, w in enumerate(plan.widths))

    n = args.n
    z = jnp.asarray(rng.randn(n, z_dim) * 0.5, jnp.float32)
    ldir = jnp.asarray(rng.randn(n, 3), jnp.float32)
    vdir = jnp.asarray(rng.randn(n, 3), jnp.float32)
    w_loss = jnp.asarray(rng.randn(n, 1), jnp.float32)

    def shipping_fn(z_, l_, v_):
        rusink = geomops.dir2rusink(l_, v_)
        x = jnp.concatenate((z_, rusink), axis=1)
        return pm.apply_chain(plan, x, list(params), needs_dw=False)

    fused = jax.jit(lambda z_, l_, v_: pr._fused(
        plan, z_, l_, v_, params))
    shipping = jax.jit(shipping_fn)
    ref32 = jax.jit(lambda z_, l_, v_: pr.reference(
        plan, z_, l_, v_, list(params)))

    # ---- 1. forward parity (fused vs shipping; ref32 = noise floor)
    y_f = np.asarray(fused(z, ldir, vdir))
    y_s = np.asarray(shipping(z, ldir, vdir))
    y_r = np.asarray(ref32(z, ldir, vdir))
    scale = float(np.abs(y_r).mean())
    fwd_fs = float(np.abs(y_f - y_s).mean()) / scale
    fwd_fs_max = float(np.abs(y_f - y_s).max()) / scale
    fwd_floor = float(np.abs(y_s - y_r).max()) / scale
    print(f"fwd fused-vs-ship: mean {fwd_fs:.3e} max {fwd_fs_max:.3e} "
          f"(ship-vs-ref32 bf16 floor: max {fwd_floor:.3e})")

    # ---- 2. analytic gradients: fused VJP vs shipping autodiff
    def loss_fused(z_, l_, v_):
        return jnp.sum(w_loss * pr._fused(plan, z_, l_, v_, params))

    def loss_ship(z_, l_, v_):
        return jnp.sum(w_loss * shipping_fn(z_, l_, v_))

    def loss_ref(z_, l_, v_):
        return jnp.sum(w_loss * pr.reference(plan, z_, l_, v_,
                                             list(params)))

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(z, ldir, vdir)
    gs = jax.jit(jax.grad(loss_ship, argnums=(0, 1, 2)))(z, ldir, vdir)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(z, ldir, vdir)
    grad_stats = {}
    for ai, name in enumerate(('dz', 'dldir', 'dvdir')):
        a, b, c = (np.asarray(gf[ai]), np.asarray(gs[ai]),
                   np.asarray(gr[ai]))
        gscale = max(float(np.abs(c).mean()), 1e-9)
        d_fs = np.abs(a - b) / gscale
        d_floor = np.abs(b - c) / gscale
        p99 = float(np.percentile(d_fs, 99))
        floor99 = float(np.percentile(d_floor, 99))
        grad_stats[name] = {'p50': float(np.percentile(d_fs, 50)),
                            'p99': p99, 'max': float(d_fs.max()),
                            'floor_p99': floor99}
        print(f"grad {name}: fused-vs-ship p50 "
              f"{grad_stats[name]['p50']:.2e} p99 {p99:.2e} max "
              f"{grad_stats[name]['max']:.2e} | bf16 floor p99 "
              f"{floor99:.2e}")

    # ---- 3. FD difference-quotient parity, f32 kernels
    saved_dtype = pm.KERNEL_MATMUL_DTYPE
    pm.KERNEL_MATMUL_DTYPE = None
    ns = 256
    zs, ls, vs = z[:ns], ldir[:ns], vdir[:ns]
    ws = w_loss[:ns]
    lf32 = jax.jit(lambda z_, l_, v_: jnp.sum(
        ws * pr._fused(plan, z_, l_, v_, params)))
    ls32 = jax.jit(lambda z_, l_, v_: jnp.sum(ws * shipping_fn(
        z_, l_, v_)))
    rngf = np.random.RandomState(3)
    fd_worst = 0.0
    for _ in range(args.probes):
        t = int(rngf.randint(3))
        arr = (zs, ls, vs)[t]
        i = int(rngf.randint(arr.shape[0]))
        j = int(rngf.randint(arr.shape[1]))
        eps = args.fd_eps
        base = [zs, ls, vs]
        plus = list(base)
        minus = list(base)
        plus[t] = plus[t].at[i, j].add(eps)
        minus[t] = minus[t].at[i, j].add(-eps)
        fd_f = (float(lf32(*plus)) - float(lf32(*minus))) / (2 * eps)
        fd_s = (float(ls32(*plus)) - float(ls32(*minus))) / (2 * eps)
        rel = abs(fd_f - fd_s) / max(abs(fd_s), 1.0)
        fd_worst = max(fd_worst, rel)
    pm.KERNEL_MATMUL_DTYPE = saved_dtype
    print(f"fd quotient parity (f32 kernels, {args.probes} probes): "
          f"worst rel {fd_worst:.3e}")

    # ---- 4. degeneracies finite
    same = jnp.asarray(np.tile(
        [[0.3, 0.4, 0.86], [0.0, 0.0, 1.0], [0.0, 0.0, -1.0],
         [1e-8, 0.0, 0.0]], (64, 1)), jnp.float32)
    z4 = jnp.zeros((same.shape[0], z_dim), jnp.float32)
    loss_d = lambda z_, l_, v_: jnp.sum(pr._fused(plan, z_, l_, v_,
                                                  params))
    degen_ok = True
    for lv in ((same, same), (same, -same)):
        g = jax.jit(jax.grad(loss_d, argnums=(0, 1, 2)))(z4, *lv)
        degen_ok &= all(bool(jnp.all(jnp.isfinite(x))) for x in g)
    print(f"degenerate-direction grads finite: {degen_ok}")

    # ---- 5. wall clock: fwd+bwd chained
    def timed(grad_fn, z0):
        zz = z0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            g = grad_fn(zz, ldir, vdir)
            zz = zz + 1e-6 * g[0]  # chain dispatches
        jax.block_until_ready(zz)
        return (time.perf_counter() - t0) / args.reps

    gf_j = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))
    gs_j = jax.jit(jax.grad(loss_ship, argnums=(0, 1, 2)))
    timed(gf_j, z), timed(gs_j, z)  # warm
    t_fused = timed(gf_j, z)
    t_ship = timed(gs_j, z)
    print(f"fwd+bwd wall: fused {t_fused * 1e3:.2f} ms  "
          f"shipping {t_ship * 1e3:.2f} ms")

    ok = (fwd_fs < 1e-3
          and all(s['p99'] < max(2 * s['floor_p99'], 1e-2)
                  for s in grad_stats.values())
          and fd_worst < 5e-2 and degen_ok)
    print(json.dumps({
        'ok': bool(ok), 'n': n,
        'fwd_mean_rel': fwd_fs, 'fwd_max_rel': fwd_fs_max,
        'grad': grad_stats, 'fd_worst_rel': fd_worst,
        'degen_ok': bool(degen_ok),
        'fused_ms': round(t_fused * 1e3, 3),
        'shipping_ms': round(t_ship * 1e3, 3),
    }))
    return 0 if ok else 1


if __name__ == '__main__':
    raise SystemExit(main())
