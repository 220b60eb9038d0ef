"""--multihost correctness: a 2-process jax.distributed CPU cluster
must produce the SAME updated params and loss as a single process
given the same global batch.

Exercises parallel/mesh.py's `jax.make_array_from_process_local_data`
path (shard_batch/replicate with process_count > 1), which single-
process tests can never reach. This is the behavior trainvali's
`--multihost` flag relies on; the reference's analogue is single-host
MirroredStrategy all-reduce (reference nerfactor/trainvali.py:266) —
multi-host here is beyond-reference scaling with identical semantics.

Each worker (tests/multihost_worker.py) runs one deterministic train
step on its host-local slice of a fixed 64-row global batch; process 0
dumps the updated weight matrix + loss. The 1-process run sees the full
batch; the 2-process run sees two 32-row halves stitched into the same
global array — results must agree to float32 tolerance.
"""

import os
import socket
import subprocess
import sys
from os.path import dirname, join

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cluster(nprocs, outfile, timeout=300):
    port = _free_port()
    env = dict(os.environ)
    # The workers pick their own platform/device flags; scrub the
    # conftest-injected ones so each process owns its XLA_FLAGS.
    env.pop('XLA_FLAGS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    repo = dirname(dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, '-m', 'tests.multihost_worker',
             str(pid), str(nprocs), str(port),
             outfile if pid == 0 else outfile + '.ignore'],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode(errors='replace'))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, (
            'worker exited %d:\n%s' % (p.returncode, out))


@pytest.mark.slow
def test_two_process_step_matches_single(tmp_path):
    one = str(tmp_path / 'one.npz')
    two = str(tmp_path / 'two.npz')
    _run_cluster(1, one)
    _run_cluster(2, two)
    a = np.load(one)
    b = np.load(two)
    np.testing.assert_allclose(a['w'], b['w'], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a['loss'], b['loss'], rtol=1e-5,
                               atol=1e-6)
