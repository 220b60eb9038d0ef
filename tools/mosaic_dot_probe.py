"""Attribute the fused-chain residual above the pass-cost roofline.

QUALITY.md round 4: the joint step's chain calls run at ~75-80% of the
pass-cost roofline (33 MXU passes x 0.157 ms speed-of-light at 1M rows
vs ~6.4 ms measured); bisection ruled out dW lane-reduces and operand
casts. The named suspects are Mosaic scheduling bubbles between
SERIALLY DEPENDENT dots and the grid prologue/epilogue.

This probe measures exactly that, outside our kernels: a minimal
Pallas kernel whose grid step runs D 128x128 bf16 dots over a
(128, block) operand, in three dependency structures:

  serial:  y = W_i @ y          (our chains' inner loop: distance-1
                                 dependence between consecutive dots)
  indep:   y_j = W_i @ x        (same pass count, no dot depends on
                                 the previous one; accumulated into
                                 the output so nothing is DCE'd)
  pair:    two half-depth serial chains interleaved (dependency
                                 distance 2 -- what software
                                 pipelining could buy)

Per-dot cost is the SLOPE of wall-clock vs D at fixed (block, grid):
intercepts (dispatch, prologue/epilogue, boundary transfers) cancel.
If serial-slope ~= indep-slope ~= the roofline, the residual lives in
our kernels' plumbing; if serial-slope > indep-slope, it is a Mosaic
dependency bubble and `pair` tells us whether manual interleaving can
recover it (the round-4 lane-split experiment says Mosaic will not do
it for us).

Grid prologue/epilogue is probed separately by sweeping the grid count
at a fixed total column count (total passes constant, grid steps vary).

Usage:
    python -m tools.mosaic_dot_probe            # slope probe
    python -m tools.mosaic_dot_probe --grid_sweep
"""

import argparse
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--block', type=int, default=4096,
                    help="lane block (columns per grid step); the "
                         "chains' fwd default")
    ap.add_argument('--cols', type=int, default=1048576,
                    help="total columns (~= the joint step's 1M rows)")
    ap.add_argument('--width', type=int, default=128)
    ap.add_argument('--depths', default='12,16,24,32',
                    help="keep all depths in the MXU-bound regime: "
                         "below ~8 dots/grid-step the passes hide "
                         "entirely under the x/y HBM streaming and the "
                         "slope reads ~0 (measured 2026-08-20)")
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--grid_sweep', action='store_true',
                    help="fixed depth 8, sweep block in "
                         "{512,1024,2048,4096,8192}: per-grid-step "
                         "overhead shows as rising ms at small blocks")
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    w = args.width

    def kernel(mode, depth, x_ref, *refs):
        o_ref = refs[-1]
        w_refs = refs[:-1]
        y = x_ref[...].astype(jnp.bfloat16)
        if mode == 'serial':
            for i in range(depth):
                y = jax.lax.dot(
                    w_refs[i][...], y,
                    preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)
            o_ref[...] = y.astype(jnp.float32)
        elif mode == 'indep':
            acc = jnp.zeros(y.shape, jnp.float32)
            for i in range(depth):
                acc += jax.lax.dot(w_refs[i][...], y,
                                   preferred_element_type=jnp.float32)
            o_ref[...] = acc
        else:  # pair: two interleaved half-chains (dep distance 2)
            y1, y2 = y, y
            for i in range(0, depth, 2):
                y1 = jax.lax.dot(
                    w_refs[i][...], y1,
                    preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)
                y2 = jax.lax.dot(
                    w_refs[i + 1][...], y2,
                    preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)
            o_ref[...] = (y1.astype(jnp.float32)
                          + y2.astype(jnp.float32))

    def build(mode, depth, block):
        grid = args.cols // block
        in_specs = [pl.BlockSpec((w, block), lambda i: (0, i))]
        in_specs += [pl.BlockSpec((w, w), lambda i: (0, 0))
                     for _ in range(depth)]
        call = pl.pallas_call(
            functools.partial(kernel, mode, depth),
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((w, block), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((w, args.cols), jnp.float32),
        )

        @jax.jit
        def step(x, ws):
            y = call(x, *ws)
            # thread output back so the tunnel can't cache dispatches
            return x + 1e-12 * y.mean(), y

        return step

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(w, args.cols) * 0.1, jnp.float32)

    def time_one(mode, depth, block):
        # Orthonormal-ish weights keep activations bounded over depth
        ws = []
        for _ in range(depth):
            q, _r = np.linalg.qr(rng.randn(w, w))
            ws.append(jnp.asarray(q, jnp.bfloat16))
        step = build(mode, depth, block)
        x = x0
        for _ in range(3):
            x, y = step(x, ws)
        float(y[0, 0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            x, y = step(x, ws)
        float(y[0, 0])
        return (time.perf_counter() - t0) / args.steps * 1e3

    if not args.grid_sweep:
        bad = [d for d in args.depths.split(',') if int(d) % 2]
        assert not bad, (
            "pair mode interleaves two half-chains, so every depth "
            "must be even (got %s) -- failing up front instead of "
            "after minutes of serial/indep timing" % ','.join(bad))

    results = {}
    if args.grid_sweep:
        depth = 8
        for block in (512, 1024, 2048, 4096, 8192):
            ms = time_one('serial', depth, block)
            results['serial_d8_block%d' % block] = round(ms, 3)
            print(json.dumps({'mode': 'serial', 'depth': depth,
                              'block': block, 'grid': args.cols // block,
                              'ms': round(ms, 3),
                              'ms_per_pass': round(ms / depth, 4)}))
    else:
        depths = [int(d) for d in args.depths.split(',')]
        for mode in ('serial', 'indep', 'pair'):
            times = []
            for depth in depths:
                ms = time_one(mode, depth, args.block)
                times.append(ms)
                print(json.dumps({'mode': mode, 'depth': depth,
                                  'block': args.block,
                                  'ms': round(ms, 3)}))
            # least-squares slope: ms per additional dot (pass)
            a = np.polyfit(depths, times, 1)
            results[mode] = {'ms_per_pass': round(float(a[0]), 4),
                             'intercept_ms': round(float(a[1]), 3)}
            print(json.dumps({'mode': mode, **results[mode]}))
    print(json.dumps({'summary': results}))


if __name__ == '__main__':
    main()
