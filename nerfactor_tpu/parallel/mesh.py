"""Device mesh + sharding for data-parallel training over rays.

The reference's only parallelism is single-host data parallelism over rays
via MirroredStrategy + NCCL all-reduce (trainvali.py:259-330). The
TPU-native equivalent: one ``jax.sharding.Mesh`` with a single 'data'
axis; batches are sharded on their leading (ray) axis, parameters are
replicated, and XLA inserts the psum over ICI when the jitted step
averages the loss/gradients across the global batch.

Models here are tiny MLPs (width 128-256), so parameters stay fully
replicated -- no tensor/pipeline parallelism is warranted; scaling is
entirely along rays/batch.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(devices=None):
    """1-D mesh over all (or the given) devices with a 'data' axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh):
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh):
    """For scan-stacked batches (step, rows, ...): rows live on axis 1;
    the step axis is unsharded (each device walks all steps)."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(arrays, mesh, stacked=False):
    """Device-puts a dict of host arrays, sharding each leading axis over
    the 'data' axis when divisible (replicating otherwise, e.g. scalars).

    ``stacked=True`` is for scan-stacked batches with a leading step
    axis: the ROW axis (axis 1) is sharded instead.

    Multi-process (multi-host) meshes: each process passes its LOCAL
    batch; rows from all hosts concatenate along the global 'data' axis
    (`jax.make_array_from_process_local_data`), i.e. the global batch is
    n_hosts x the per-host batch, mirroring how the reference's
    MirroredStrategy would scale if it were multi-worker.
    """
    data = stacked_batch_sharding(mesh) if stacked \
        else batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    multiproc = jax.process_count() > 1
    n_local = mesh.local_mesh.devices.size if multiproc \
        else mesh.devices.size
    row_axis = 1 if stacked else 0

    def pick(x):
        x = np.asarray(x)
        shardable = x.ndim >= row_axis + 1 and x.shape[row_axis] > 0 \
            and x.shape[row_axis] % max(n_local, 1) == 0
        return data if shardable else repl

    if multiproc:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                pick(x), np.asarray(x)), arrays)
    # ONE device_put call for the whole batch: each call costs a fixed
    # round trip on remote-device transports (~5 ms on the axon tunnel,
    # regardless of payload), so per-leaf puts serialize the input
    # pipeline at 7 keys x 5 ms per step
    shardings = jax.tree_util.tree_map(pick, arrays)
    return jax.device_put(arrays, shardings)


def replicate(tree, mesh):
    repl = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                repl, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), tree)
