"""A/B timer for the test-time relighting epilogue.

Compares the shipping materialization-free ``Model.render`` (two
(N, L) x (L, .) matmuls per light set; models/nerfactor.py) against the
round-1 path that materialized the (N, L, 3) contribution tensor
(reference hot loop: nerfactor.py:315-364, one re-integration per light
condition). Scale mirrors test.py's full-image chunks: N rows x 512
lights x {1 render, 512 OLATs, P probes}.

Timing method per CLAUDE.md: the epilogue is repeated ``--reps`` times
inside one ``lax.scan`` dispatch with an input-feedback carry (so the
tunnel cannot cache identical dispatches and the device cannot overlap
reps), timed as whole-run wall clock over ``--steps`` chained dispatches
with a final float() transfer.

Usage:
    python -m tools.bench_relight --rows 8192 [--no_olat]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=int, default=8192,
                    help="rays per chunk (test.py eval chunk scale)")
    ap.add_argument('--light_h', type=int, default=16)
    ap.add_argument('--probes', type=int, default=4)
    ap.add_argument('--no_olat', action='store_true')
    ap.add_argument('--reps', type=int, default=8,
                    help="epilogue evals per dispatch (lax.scan)")
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--warmup', type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    from __graft_entry__ import _make_model_and_batch

    model, _ = _make_model_and_batch(
        n_rays=args.rows, light_h=args.light_h, tiny=False)
    # The bench model has no envmap dir; give it random probes so the
    # probe-relight einsums are exercised
    rng = np.random.RandomState(0)
    model.probes_flat = jnp.asarray(rng.rand(
        args.probes, model.n_lights, 3).astype(np.float32))
    params = model.init_params(jax.random.PRNGKey(0))

    n, l_cnt = args.rows, model.n_lights
    lvis = jnp.asarray(rng.rand(n, l_cnt).astype(np.float32))
    spec = jnp.asarray(rng.rand(n, l_cnt).astype(np.float32))
    albedo = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    ldirs = rng.randn(n, l_cnt, 3).astype(np.float32)
    ldirs /= np.linalg.norm(ldirs, axis=-1, keepdims=True)
    ldirs = jnp.asarray(ldirs)
    nrm = rng.randn(n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = jnp.asarray(nrm)
    relight_olat = not args.no_olat

    def outputs_sum(rgb, rgb_olat, rgb_probes):
        tot = jnp.sum(rgb)
        if rgb_olat is not None:
            tot = tot + jnp.sum(rgb_olat)
        if rgb_probes is not None:
            tot = tot + jnp.sum(rgb_probes)
        return tot

    def factored_once(lv):
        return outputs_sum(*model.render(
            params, lv, spec, albedo, ldirs, nrm,
            relight_olat=relight_olat, relight_probes=True))

    def materialized_once(lv):
        # Round-1 epilogue: build the dense (N, L, 3) contribution
        # tensor, then one contraction per light condition
        brdf = albedo[:, None, :] / jnp.pi + spec[:, :, None]
        contrib = model._light_contrib(lv, brdf, ldirs, nrm)
        light_flat = model.light_from(params).reshape(-1, 3)
        rgb = model._finish_render(
            jnp.einsum('nlc,lc->nc', contrib, light_flat))
        tot = jnp.sum(rgb)
        if relight_olat:
            olat = model.olat_inten * contrib[:, model.olat_inds, :]
            if model.ambient_inten > 0:
                olat = olat + model.ambient_inten * jnp.sum(
                    contrib, axis=1, keepdims=True)
            tot = tot + jnp.sum(model._finish_render(olat))
        probes = jnp.einsum('nlc,plc->npc', contrib, model.probes_flat)
        return tot + jnp.sum(model._finish_render(probes))

    def chained(once):
        @jax.jit
        def run(lv):
            def body(carry, _):
                tot = once(carry)
                # Input feedback: next rep's lvis depends on this rep's
                # outputs, defeating tunnel dispatch caching / overlap
                nxt = carry * (1.0 - 1e-7) + 1e-7 * jnp.tanh(tot)
                return nxt, tot
            lv, tots = jax.lax.scan(body, lv, None, length=args.reps)
            return lv, tots[-1]
        return run

    results = {}
    for name, once in (('factored', factored_once),
                       ('materialized', materialized_once)):
        run = chained(once)
        lv = lvis
        for _ in range(args.warmup):
            lv, tot = run(lv)
        float(tot)
        t0 = time.perf_counter()
        lv = lvis
        for _ in range(args.steps):
            lv, tot = run(lv)
        tot = float(tot)
        dt = time.perf_counter() - t0
        results[name] = {
            'ms_per_eval': round(1e3 * dt / (args.steps * args.reps), 3),
            'checksum': tot,
        }
    assert np.isclose(results['factored']['checksum'],
                      results['materialized']['checksum'], rtol=1e-3), \
        "A/B paths disagree: %r" % results
    results['speedup'] = round(
        results['materialized']['ms_per_eval']
        / results['factored']['ms_per_eval'], 2)
    results['config'] = {'rows': n, 'lights': l_cnt, 'olat': relight_olat,
                         'probes': args.probes}
    print(json.dumps(results))


if __name__ == '__main__':
    main()
