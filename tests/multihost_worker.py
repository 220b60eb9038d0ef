"""Worker for tests/test_multihost.py: one of N processes in a
jax.distributed CPU cluster. Runs ONE deterministic train step on its
host-local half of a known global batch through
parallel/mesh.shard_batch's make_array_from_process_local_data path,
then (process 0) dumps the updated params.

Usage: python -m tests.multihost_worker <pid> <nprocs> <port> <outfile>
"""

import os
import sys


def main():
    pid, nprocs, port, outfile = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=4').strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(
        coordinator_address='localhost:%d' % port,
        num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert jax.device_count() == 4 * nprocs

    import jax.numpy as jnp
    import numpy as np
    from nerfactor_tpu.parallel import mesh as meshlib
    from nerfactor_tpu.parallel.train import (
        build_optimizer, make_train_step)
    from tests.test_train_scan import ToyModel

    model = ToyModel()
    params = model.init_params(jax.random.PRNGKey(0))
    opt = build_optimizer(model.config)
    opt_state = opt.init(params)
    train_step = make_train_step(model, opt)

    rng = np.random.RandomState(0)
    n_global = 64
    x = rng.randn(n_global, 4).astype(np.float32)
    y = rng.randn(n_global, 2).astype(np.float32)
    lo = pid * (n_global // nprocs)
    hi = lo + n_global // nprocs
    local = {'x': x[lo:hi], 'y': y[lo:hi]}

    dmesh = meshlib.make_mesh()
    params = meshlib.replicate(params, dmesh)
    opt_state = meshlib.replicate(opt_state, dmesh)
    arrays = meshlib.shard_batch(local, dmesh)
    params, opt_state, loss = train_step(
        params, opt_state, arrays, jax.random.PRNGKey(7))
    w = np.asarray(jax.device_get(params['w']))
    loss = float(loss)
    if pid == 0:
        np.savez(outfile, w=w, loss=loss)
    jax.distributed.shutdown()


if __name__ == '__main__':
    main()
