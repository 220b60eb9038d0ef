"""TPU-side verification of the fused dir2rusink->BRDF-chain kernel
(ops/pallas_rusink.py) against the unfused XLA program, at the joint
model's real plan/scale (VERDICT round 1, item 2):

1. forward parity at N = rays x lights scale;
2. analytic input gradients (the hand-derived safe-VJP) vs the XLA
   path's autodiff through ops/geom.dir2rusink + chain_reference;
3. central finite differences of a scalar loss through the FUSED path
   at randomly probed coordinates of z / ldir / vdir;
4. wall-clock of fused vs unfused fwd+bwd (whole-run, chained
   dispatches, terminal block_until_ready -- the only trustworthy
   timing through the tunnel).

Run: python -m tools.verify_rusink_kernel [--n 524288] [--probes 24]
"""

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--n', type=int, default=524288,
                   help="rows (default 1024 rays x 512 lights)")
    p.add_argument('--probes', type=int, default=24)
    p.add_argument('--fd_eps', type=float, default=3e-3)
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

    fused = jax.jit(lambda z_, l_, v_: pr._fused(
        plan, z_, l_, v_, params))
    unfused = jax.jit(lambda z_, l_, v_: pr.reference(
        plan, z_, l_, v_, list(params)))

    # 1. forward parity
    y_f = np.asarray(fused(z, ldir, vdir))
    y_r = np.asarray(unfused(z, ldir, vdir))
    fwd_max = float(np.max(np.abs(y_f - y_r)))
    fwd_rel = float(np.max(
        np.abs(y_f - y_r) / (1e-3 + np.abs(y_r))))
    print(f"forward: max abs diff {fwd_max:.3e}  max rel {fwd_rel:.3e}")

    # 2. analytic gradients, fused vs XLA autodiff
    def loss_fused(z_, l_, v_):
        return jnp.sum(w_loss * pr._fused(plan, z_, l_, v_, params))

    def loss_unfused(z_, l_, v_):
        return jnp.sum(w_loss * pr.reference(plan, z_, l_, v_,
                                             list(params)))

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(z, ldir, vdir)
    gr = jax.jit(jax.grad(loss_unfused, argnums=(0, 1, 2)))(
        z, ldir, vdir)
    grad_stats = {}
    for a, b, name in zip(gf, gr, ('dz', 'dldir', 'dvdir')):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        diff = np.abs(a - b).max()
        grad_stats[name] = (float(diff), float(scale))
        print(f"grad {name}: max abs diff {diff:.3e} "
              f"(grad scale {scale:.3e}, ratio {diff / scale:.3e})")

    # 3. finite differences through the FUSED path
    loss_fused_j = jax.jit(loss_fused)
    base_args = [z, ldir, vdir]
    fd_worst = 0.0
    probes = []
    for _ in range(args.probes):
        t = int(rng.randint(3))
        i = int(rng.randint(n))
        j = int(rng.randint(base_args[t].shape[1]))
        eps = args.fd_eps
        plus = [a for a in base_args]
        minus = [a for a in base_args]
        plus[t] = plus[t].at[i, j].add(eps)
        minus[t] = minus[t].at[i, j].add(-eps)
        fd = (float(loss_fused_j(*plus)) -
              float(loss_fused_j(*minus))) / (2 * eps)
        an = float(np.asarray(gf[t])[i, j])
        denom = max(abs(fd), abs(an), 1e-2)
        rel = abs(fd - an) / denom
        fd_worst = max(fd_worst, rel)
        probes.append((('z', 'ldir', 'vdir')[t], i, j, fd, an, rel))
    for t, i, j, fd, an, rel in probes:
        print(f"fd {t}[{i},{j}]: fd {fd:+.5f} analytic {an:+.5f} "
              f"rel {rel:.3e}")
    print(f"fd worst rel: {fd_worst:.3e}")

    # 4. wall clock: fwd+bwd chained
    def timed(grad_fn, z0):
        zz = z0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            g = grad_fn(zz, ldir, vdir)
            zz = zz + 1e-6 * g[0]  # chain dispatches
        jax.block_until_ready(zz)
        return (time.perf_counter() - t0) / args.reps

    gf_j = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))
    gr_j = jax.jit(jax.grad(loss_unfused, argnums=(0, 1, 2)))
    timed(gf_j, z), timed(gr_j, z)  # warm
    t_fused = timed(gf_j, z)
    t_unfused = timed(gr_j, z)
    print(f"fwd+bwd wall: fused {t_fused * 1e3:.2f} ms  "
          f"unfused {t_unfused * 1e3:.2f} ms")

    ok = (fwd_rel < 5e-3
          and all(d / s < 5e-3 for d, s in grad_stats.values())
          and fd_worst < 5e-2)
    print(json.dumps({
        'ok': bool(ok), 'n': n,
        'fwd_max_rel': fwd_rel,
        'grad_max_rel': {k: d / s for k, (d, s) in grad_stats.items()},
        'fd_worst_rel': fd_worst,
        'fused_ms': round(t_fused * 1e3, 3),
        'unfused_ms': round(t_unfused * 1e3, 3),
    }))
    return 0 if ok else 1


if __name__ == '__main__':
    raise SystemExit(main())
