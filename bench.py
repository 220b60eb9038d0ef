"""Headline benchmark: joint-optimization (NeRFactor stage-3) training
throughput in rays/sec/chip at reference-scale settings (1024 rays/step,
16x32 light sphere = 512 visibility directions, 128x4 MLPs, posenc 10).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` is relative to BASELINE_RAYS_PER_SEC, an estimate of the
TF-2.2 GPU reference: its telemetry (trainvali.py:179-182) logs
batch_time_train for 1024-ray steps; a V100-class GPU runs the same
forward+backward (2x 512-light MLP blowups, chunked) at roughly 0.5 s per
step => ~2,048 rays/sec. The reference repo publishes no numbers, but
the estimate is now bounded by a MEASUREMENT (BASELINE.md "Measured
baselines"): the reference's own trainvali.py, run end-to-end on this
host's CPU (TF 2.21, oneDNN), sustains 8.59 s/step = 119 rays/s at
identical settings -- the 2,048 anchor therefore assumes the GPU is
~17x that measured CPU figure. Treat vs_baseline as indicative (GPU
roofline arguments span ~17-280x over one CPU core); the absolute
rays/sec/chip value is the trustworthy metric.

Dispatch mode matches shipping training: nerfactor.ini's scan_steps=8
multi-step lax.scan dispatch (trainvali's default drive), timed as
whole-run wall clock over chained dispatches with a terminal
block_until_ready (the only trustworthy method on tunneled TPUs).
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 2048.0
N_RAYS = 1024
WARMUP_STEPS = 3
# Enough scan-dispatches (20 x scan_steps=8 -> 160 optimizer steps)
# that the host's run-ahead keeps the device pipeline FULL, as real
# training does (trainvali streams dispatches continuously). With only
# 2-3 timed dispatches the un-hidden per-dispatch tunnel latency
# (~10 ms RTT) inflates ms/step by ~1 ms (measured: 3 dispatches
# report ~9.5 ms/step; 32 dispatches report ~8.6 ms/step, and the
# per-op device profile sums to ~8.5 ms/step -- tools/profile_joint).
BENCH_STEPS = 160


def main():
    import jax
    # The joint train step takes minutes to compile; persist the XLA
    # cache so repeated benchmark runs skip straight to timing
    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass
    from __graft_entry__ import _make_model_and_batch
    from nerfactor_tpu.parallel.train import build_optimizer, \
        make_train_step_scan

    model, batch = _make_model_and_batch(
        n_rays=N_RAYS, light_h=16, tiny=False)
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = build_optimizer(model.config)
    opt_state = optimizer.init(params)
    # Measure the SHIPPING dispatch mode: nerfactor.ini defaults to
    # scan_steps=8 (one lax.scan dispatch runs 8 optimizer steps over
    # stacked batches), which is how trainvali actually drives the
    # device; single-step dispatch adds ~1 ms/step of host/tunnel
    # overhead that real training does not pay.
    scan_steps = model.config.getint('scan_steps', fallback=8)
    train_steps = make_train_step_scan(
        model, optimizer, trainable_mask=model.trainable_mask(params),
        n_steps=scan_steps)

    stacked = {k: np.broadcast_to(
        v, (scan_steps,) + np.asarray(v).shape).copy()
        for k, v in batch.items()}
    arrays = jax.device_put(stacked)
    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP_STEPS):
        key, sub = jax.random.split(key)
        params, opt_state, losses = train_steps(
            params, opt_state, arrays, sub)
    losses.block_until_ready()

    n_disp = -(-BENCH_STEPS // scan_steps)
    t0 = time.perf_counter()
    for _ in range(n_disp):
        key, sub = jax.random.split(key)
        params, opt_state, losses = train_steps(
            params, opt_state, arrays, sub)
    losses.block_until_ready()
    dt = time.perf_counter() - t0

    loss = losses[-1]
    assert np.isfinite(float(loss)), "Benchmark loss went non-finite"
    rays_per_sec = N_RAYS * scan_steps * n_disp / dt
    print(json.dumps({
        'metric': 'nerfactor_joint_train_throughput',
        'value': round(rays_per_sec, 1),
        'unit': 'rays/sec/chip',
        'vs_baseline': round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))
    try:  # per-stage round-over-round record (PERF.jsonl)
        from tools import perf_ledger
        perf_ledger.append(
            'joint_step', rays_per_sec, 'rays/sec/chip',
            config='1024 rays x 512 lights, 128x4 MLPs, '
                   'scan-%d dispatch' % scan_steps)
    except Exception:
        pass


if __name__ == '__main__':
    main()
