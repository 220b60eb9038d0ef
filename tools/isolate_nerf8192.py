"""Bisects the libtpu regalloc RET_CHECK crash on the NeRF train step
at n_rays=8192 (CLAUDE.md / ROADMAP.md known trap; n_rays<=4096 works).

Each probe compiles + runs the NeRF step in a SUBPROCESS (the crash
aborts the process, not just the call) with one knob changed, so the
pass/crash pattern pins which program dimension trips the compiler:
the fused Pallas NeRF kernel vs the XLA path, bf16 vs f32 chains,
sample counts, and kernel block-size overrides.

    python -m tools.isolate_nerf8192 [--rays 8192] [--quick]
"""

import argparse
import json
import os
import subprocess
import sys

PROBES = [
    # (name, override, extra_env)
    ('default_fused', '', {}),
    ('xla_path', 'fused_mlp=False', {}),
    ('xla_f32', 'fused_mlp=False,bf16_big_chains=False', {}),
    ('fused_half_samples', 'n_samples_coarse=32,n_samples_fine=64', {}),
    ('fused_fwd_block_2048', '', {'NERFACTOR_NERF_BLOCK_FWD': '2048'}),
    ('fused_bwd_block_1024', '', {'NERFACTOR_NERF_BLOCK_BWD': '1024'}),
    ('fused_fwd1024_bwd512', '',
     {'NERFACTOR_NERF_BLOCK_FWD': '1024', 'NERFACTOR_NERF_BLOCK_BWD': '512'}),
    ('fused_small_chunk', 'mlp_chunk=262144', {}),
]


def run_probe(name, override, extra_env, rays, timeout):
    env = dict(os.environ)
    env.update(extra_env)
    cmd = [sys.executable, '-m', 'tools.step_time', '--model', 'nerf',
           '--rays', str(rays), '--steps', '2', '--warmup', '1']
    if override:
        cmd += ['--override', override]
    try:
        proc = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    except subprocess.TimeoutExpired:
        return {'probe': name, 'status': 'timeout'}
    if proc.returncode == 0:
        last = proc.stdout.strip().splitlines()[-1]
        try:
            ms = json.loads(last).get('ms_per_step')
        except (ValueError, IndexError):
            ms = None
        return {'probe': name, 'status': 'ok', 'ms_per_step': ms}
    # Crash: find the first libtpu/RET_CHECK line for the record
    sig = ''
    for line in (proc.stderr + proc.stdout).splitlines():
        if 'RET_CHECK' in line or 'regalloc' in line.lower() \
                or 'INTERNAL' in line:
            sig = line.strip()[:200]
            break
    return {'probe': name, 'status': 'crash(rc=%d)' % proc.returncode,
            'signature': sig}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rays', type=int, default=8192)
    ap.add_argument('--timeout', type=int, default=900,
                    help="per-probe seconds (fresh compiles are slow)")
    ap.add_argument('--quick', action='store_true',
                    help="only the first three probes")
    ap.add_argument('--probe', default='',
                    help="run a single probe by name")
    args = ap.parse_args()
    probes = PROBES[:3] if args.quick else PROBES
    if args.probe:
        probes = [p for p in PROBES if p[0] == args.probe]
    for name, override, extra_env in probes:
        res = run_probe(name, override, extra_env, args.rays, args.timeout)
        print(json.dumps(res), flush=True)


if __name__ == '__main__':
    main()
