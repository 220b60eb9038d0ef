"""Isolated timing probe for one embed->MLP->head chain at lvis scale.

Times JUST the chain (reference XLA path vs fused Pallas kernel) at the
joint step's dominant shape (524288 rows x the 128x4 lvis MLP), with
steps chained through the parameters so the TPU tunnel cannot cache
dispatches (CLAUDE.md measurement rules).

    python -m tools.chain_probe --impl fused --mode both
    python -m tools.chain_probe --impl ref --compute_dtype bf16
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--impl', choices=['ref', 'fused', 'fused_rowmajor'],
                    default='ref')
    ap.add_argument('--mode', choices=['fwd', 'both'], default='both')
    ap.add_argument('--rows', type=int, default=524288)
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--width', type=int, default=128)
    ap.add_argument('--depth', type=int, default=4)
    ap.add_argument('--compute_dtype', choices=['f32', 'bf16'],
                    default='f32', help="reference-path activation dtype")
    ap.add_argument('--matmul_dtype', choices=['f32', 'bf16'],
                    default='f32', help="global MXU operand dtype "
                    "(applies inside the Pallas kernel too)")
    ap.add_argument('--out_width', type=int, default=1,
                    help="head width (M of the final dot)")
    ap.add_argument('--fx', type=int, default=10,
                    help="posenc freqs for the xyz part")
    ap.add_argument('--fl', type=int, default=4,
                    help="posenc freqs for the ldir part")
    ap.add_argument('--needs_dx', action='store_true',
                    help="fused path: also produce input cotangents")
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    import jax.numpy as jnp
    import numpy as np
    from nerfactor_tpu.models import networks
    from nerfactor_tpu.ops import pallas_mlp as pm

    if args.matmul_dtype == 'bf16':
        networks.MATMUL_DTYPE = jnp.bfloat16
    compute_dtype = jnp.bfloat16 if args.compute_dtype == 'bf16' else None

    plan = pm.make_plan([(3, args.fx), (3, args.fl)],
                        (args.width,) * args.depth + (args.out_width,),
                        ('relu',) * args.depth + ('sigmoid',),
                        (args.depth // 2 - 1,))
    rng = np.random.RandomState(0)
    dims = pm.layer_in_dims(plan)
    params = [
        (jnp.asarray(rng.randn(dims[i], w) * 0.1, jnp.float32),
         jnp.asarray(rng.randn(w) * 0.01, jnp.float32))
        for i, w in enumerate(plan.widths)]
    x = jnp.asarray(rng.randn(args.rows, pm.raw_dim(plan)), jnp.float32)

    def chain(x_, p_):
        if args.impl.startswith('fused'):
            return pm._fused_chain(
                plan, x_, p_, needs_dx=args.needs_dx,
                transposed=(args.impl == 'fused'))
        return pm.chain_reference(plan, x_, p_,
                                  compute_dtype=compute_dtype)

    if args.mode == 'fwd':
        @jax.jit
        def step(p):
            y = chain(x, p)
            # Thread a scalar of the output back into the params so
            # successive dispatches differ
            s = 1e-12 * jnp.mean(y)
            return [(w + s, b) for w, b in p]
    else:
        @jax.jit
        def step(p):
            def loss(p_):
                return jnp.mean(chain(x, p_) ** 2)

            g = jax.grad(loss)(p)
            return [(w - 1e-6 * gw, b - 1e-6 * gb)
                    for (w, b), (gw, gb) in zip(p, g)]

    for _ in range(3):
        params = step(params)
    float(jnp.sum(params[0][0]))

    t0 = time.perf_counter()
    for _ in range(args.steps):
        params = step(params)
    checksum = float(jnp.sum(params[0][0]))
    dt = time.perf_counter() - t0
    print(json.dumps({
        'impl': args.impl, 'mode': args.mode, 'rows': args.rows,
        'compute_dtype': args.compute_dtype,
        'matmul_dtype': args.matmul_dtype,
        'ms_per_step': round(1e3 * dt / args.steps, 2),
        'checksum': checksum,
    }))


if __name__ == '__main__':
    main()
