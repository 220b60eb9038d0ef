"""A general training and validation pipeline (all four trainable models).

CLI parity with the reference's trainvali.py:
  python -m nerfactor_tpu.trainvali --config=brdf.ini \
      --config_override='data_root=...,outroot=...' [--debug] [--device=...]

Differences by design (TPU-first):
  * one jitted, mesh-sharded train step instead of eager + MirroredStrategy;
  * checkpoints are pytree .npz files (same ckpt-N epoch naming);
  * scalars go to <outdir>/summary_{train,vali}.jsonl plus consolidated
    HTML galleries per validation epoch (same artifact layout).
"""

import argparse
import os
import queue
import shutil
import threading
from collections import deque
from os.path import join, dirname
from time import time

import jax
import numpy as np

from nerfactor_tpu import datasets, models
from nerfactor_tpu.parallel import mesh as meshlib
from nerfactor_tpu.parallel.train import (
    build_optimizer, make_train_step, make_train_step_scan,
    make_eval_step)
from nerfactor_tpu.utils import config as configutil, io as ioutil
from nerfactor_tpu.utils.ckpt import CheckpointManager
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="trainvali")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--config', default='nerf.ini',
                   help="base .ini in config/ or a full path")
    p.add_argument('--config_override', default='',
                   help="e.g. 'key1=value1,key2=value2'")
    p.add_argument('--debug', action='store_true')
    p.add_argument('--device', default='tpu', choices=['cpu', 'gpu', 'tpu'],
                   help="accepted for CLI parity; JAX picks the platform")
    p.add_argument('--profile_steps', type=int, default=0,
                   help="capture a jax.profiler trace of the first N "
                        "train steps into <outdir>/profile")
    p.add_argument('--multihost', action='store_true',
                   help="initialize jax.distributed and train data-"
                        "parallel across all hosts: each host feeds its "
                        "local batch (global batch = n_hosts x "
                        "n_rays_per_step); checkpoints/summaries/vis are "
                        "written by host 0 only. Requires the standard "
                        "JAX coordinator environment, or the explicit "
                        "--coordinator/--num_processes/--process_id "
                        "flags for manually launched clusters.")
    p.add_argument('--coordinator', default=None,
                   help="with --multihost: coordinator host:port "
                        "(default: JAX cluster auto-detection)")
    p.add_argument('--num_processes', type=int, default=None,
                   help="with --multihost: total process count")
    p.add_argument('--process_id', type=int, default=None,
                   help="with --multihost: this process's id")
    return p.parse_args(argv)


def load_config(config_flag, override=''):
    config_ini = configutil.resolve_config_path(config_flag)
    parser = configutil.read_config(config_ini)
    configutil.apply_override(parser, override)
    return parser


class SummaryWriter:
    """Append-only JSONL scalar log, plus — when TensorFlow is
    importable and ``tensorboard`` is on — real TensorBoard event
    files in the same summary directory, so ``tensorboard --logdir
    <outdir>`` works exactly as with the reference
    (reference trainvali.py:149-152,203-220,240-254). The JSONL stays
    the canonical artifact (grep-able on headless TPU hosts); the
    event files are ecosystem parity. No TF dependency is required:
    absence degrades to JSONL-only with a warning."""

    def __init__(self, path, tensorboard=True):
        self.path = path
        os.makedirs(dirname(path), exist_ok=True)
        self._tf, self._tb = None, None
        if tensorboard:
            try:
                import tensorflow as tf
                self._tf = tf
                self._tb = tf.summary.create_file_writer(dirname(path))
            except Exception as exc:  # no TF in env: JSONL only
                logger.warn('TensorBoard writer unavailable (%s); '
                            'writing JSONL scalars only', exc)

    def scalars(self, step, **kv):
        rec = {'step': int(step)}
        rec.update({k: (float(v) if v is not None else None)
                    for k, v in kv.items()})
        with open(self.path, 'a') as h:
            import json
            h.write(json.dumps(rec) + '\n')
        if self._tb is not None:
            with self._tb.as_default():
                for k, v in kv.items():
                    if v is not None:
                        self._tf.summary.scalar(k, float(v),
                                                step=int(step))

    def text(self, step, tag, value):
        with open(self.path, 'a') as h:
            import json
            h.write(json.dumps({'step': int(step), tag: value}) + '\n')
        if self._tb is not None:
            with self._tb.as_default():
                self._tf.summary.text(tag, str(value), step=int(step))

    def flush(self):
        if self._tb is not None:
            self._tb.flush()


def split_batch(dataset, batch):
    """Splits a dataset batch dict into (meta, arrays-for-device)."""
    array_keys = getattr(dataset, 'array_keys', None)
    arrays, meta = {}, {}
    for k, v in batch.items():
        is_arr = (array_keys is not None and k in array_keys) or (
            array_keys is None and isinstance(v, np.ndarray))
        if is_arr:
            v = np.asarray(v)
            if v.dtype == np.float64:
                v = v.astype(np.float32)
            elif v.dtype == np.int64:
                v = v.astype(np.int32)
            arrays[k] = v
        else:
            meta[k] = v
    return meta, arrays


def device_batches(dataset, datapipe, dmesh, lookahead=3, group=1,
                   n_epochs=1):
    """Iterator of (n_steps, metas, device_arrays, epoch_done) fed by a
    background thread: host batch assembly AND the host->device
    transfers of the next ``lookahead`` items overlap the device step
    on the current one -- prefetch-to-device, the tf.data `prefetch`
    parity the reference gets from its input pipeline
    (datasets/base.py:84-114 there). On this environment's tunneled TPU
    the transfer is network IO, which the thread overlaps even on a
    single-core host (device_put releases the GIL during the socket
    work).

    ``group`` > 1 stacks that many host batches along a new leading
    step axis and transfers them as ONE put (for lax.scan multi-step
    dispatch, which amortizes the per-dispatch host overhead that
    dominates the step on this tunneled single-core environment).
    Leftover batches (n % group) are yielded singly with n_steps=1.

    ``n_epochs`` passes over ``datapipe`` stream from ONE persistent
    producer, so the lookahead spans epoch boundaries -- the next
    epoch's transfers overlap the current epoch's sync/checkpoint work
    (essential when grouping leaves only one item per epoch). The last
    item of each pass carries epoch_done=True.
    """
    q = queue.Queue(maxsize=lookahead)
    stop = threading.Event()
    sentinel = object()
    err = []

    def put(item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for _ in range(n_epochs):
                if stop.is_set():
                    return
                pending = None  # one-item lag to tag the epoch's last
                pend = []
                for batch in datapipe:
                    pend.append(split_batch(dataset, batch))
                    if group <= 1 or len(pend) == group:
                        item = _emit(pend, dmesh, group)
                        pend = []
                        if pending is not None and \
                                not put(pending + (False,)):
                            return
                        pending = item
                for one in pend:  # remainder: single-step items
                    item = _emit([one], dmesh, 1)
                    if pending is not None and \
                            not put(pending + (False,)):
                        return
                    pending = item
                assert pending is not None, "Dataset is empty"
                if not put(pending + (True,)):
                    return
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            put(sentinel)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()  # unblock the producer if the consumer bails early


def _emit(pend, dmesh, group):
    metas = [m for m, _ in pend]
    if group <= 1 or len(pend) == 1:
        arrays = meshlib.shard_batch(pend[0][1], dmesh)
        return 1, metas, arrays
    stacked = {k: np.stack([a[k] for _, a in pend])
               for k in pend[0][1]}
    return len(pend), metas, meshlib.shard_batch(stacked, dmesh,
                                                 stacked=True)


def maintain_epoch_queue(queue, new_epoch_dir):
    queue.appendleft(new_epoch_dir)
    parent = dirname(new_epoch_dir)
    for epoch_dir in ioutil.sortglob(parent, '*'):
        if epoch_dir not in queue:
            shutil.rmtree(epoch_dir)


def main(argv=None):
    args = parse_args(argv)
    if args.debug:
        logger.warn("Debug mode: on")
    if args.device == 'cpu':
        # The env var alone cannot force CPU when a platform plugin has
        # pinned jax_platforms via jax.config (the axon TPU plugin
        # does); the config update beats it when issued before first
        # backend use
        jax.config.update('jax_platforms', 'cpu')
    if args.multihost:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)
        logger.info("Multi-host: process %d/%d, %d/%d devices local",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
    is_lead = jax.process_index() == 0

    parser = load_config(args.config, args.config_override)
    config = configutil.Config(parser)

    # Output directory from xname template
    xname = configutil.get_xname(parser)
    outroot = config.get('outroot')
    outdir = join(outroot, xname)
    if is_lead:
        ioutil.prepare_outdir(outdir,
                              overwrite=config.getboolean('overwrite'))
        logger.info("For results, see:\n\t%s", outdir)
        configutil.write_config(parser, outdir.rstrip('/') + '.ini')

    # Mesh: data-parallel over rays
    dmesh = meshlib.make_mesh()

    # Datasets. Per-host seeds make each host sample a disjoint random
    # set of rays, so the multi-host global batch carries n_hosts x the
    # information of a single-host one
    dataset_name = config.get('dataset')
    Dataset = datasets.get_dataset_class(dataset_name)
    dataset_train = Dataset(config, 'train', debug=args.debug,
                            seed=jax.process_index())
    datapipe_train = dataset_train.build_pipeline()
    try:
        dataset_vali = Dataset(config, 'vali', debug=args.debug)
        n_vali_batches = config.getint('vali_batches')
        datapipe_vali = dataset_vali.build_pipeline(
            no_shuffle=True, take=n_vali_batches)
    except FileNotFoundError:
        dataset_vali, datapipe_vali = None, None

    # Model + params
    model_name = config.get('model')
    Model = models.get_model_class(model_name)
    model = Model(config, debug=args.debug)
    key = jax.random.PRNGKey(config.getint('seed', fallback=0) or 0)
    key, init_key = jax.random.split(key)
    params = model.init_params(init_key)

    # Optimizer
    optimizer = build_optimizer(config)
    opt_state = optimizer.init(params)

    # Checkpointing (ckpt-N indexes epochs)
    ckptdir = join(outdir, 'checkpoints')
    keep_recent_epochs = config.getint('keep_recent_epochs', fallback=-1)
    max_to_keep = keep_recent_epochs if keep_recent_epochs > 0 else None
    ckptmanager = CheckpointManager(ckptdir, max_to_keep=max_to_keep)
    step_restored = ckptmanager.latest_step()
    if step_restored > 0:
        state = ckptmanager.restore({'params': params,
                                     'opt_state': opt_state})
        params, opt_state = state['params'], state['opt_state']
        logger.info("Resumed from epoch %d", step_restored)
    else:
        logger.info("Started from scratch")

    # Shard: params replicated, batches split over rays
    params = meshlib.replicate(params, dmesh)
    opt_state = meshlib.replicate(opt_state, dmesh)

    trainable_mask = getattr(model, 'trainable_mask', None)
    if trainable_mask is not None:
        trainable_mask = trainable_mask(params)
    train_step = make_train_step(model, optimizer,
                                 trainable_mask=trainable_mask)
    # Multi-step dispatch: lax.scan over scan_steps stacked batches per
    # dispatch. The device step is ~14 ms while each dispatch costs
    # ~25 ms of host/tunnel overhead on this environment (measured;
    # single-core host), so grouping is the difference between host-
    # and device-bound at reference scale. 1 disables (and --debug
    # forces 1: it breaks after the first batch).
    scan_steps = config.getint('scan_steps', fallback=1)
    if args.debug:
        scan_steps = 1
    train_step_scan = None
    if scan_steps > 1:
        train_step_scan = make_train_step_scan(
            model, optimizer, trainable_mask=trainable_mask,
            n_steps=scan_steps)
    vali_step = make_eval_step(model, mode='vali')

    # TensorBoard event files alongside the JSONL (reference
    # trainvali.py:149-152 parity); host 0 only under --multihost
    write_tb = config.getboolean('tensorboard', fallback=True) \
        and is_lead
    writer_train = SummaryWriter(join(outdir, 'summary_train',
                                      'scalars.jsonl'),
                                 tensorboard=write_tb)
    writer_vali = SummaryWriter(join(outdir, 'summary_vali',
                                     'scalars.jsonl'),
                                tensorboard=write_tb)
    train_vis_epoch_dir = join(outdir, 'vis_train', 'epoch{e:09d}')
    vali_vis_epoch_dir = join(outdir, 'vis_vali', 'epoch{e:09d}')
    train_epoch_deque = deque([], max_to_keep)
    vali_epoch_deque = deque([], max_to_keep)

    epochs = config.getint('epochs')
    ckpt_period = config.getint('ckpt_period')
    vali_period = config.getint('vali_period')

    # Optional profiler capture of the first few steps
    profile_left = args.profile_steps
    if profile_left > 0:
        profile_dir = join(outdir, 'profile')
        jax.profiler.start_trace(profile_dir)
        logger.info("Profiling %d steps into %s", profile_left,
                    profile_dir)

    step = step_restored
    period_t0 = time()
    period_batches = 0
    # One persistent producer across ALL epochs (lookahead spans epoch
    # boundaries); debug mode breaks mid-epoch, so it gets a fresh
    # single-epoch producer per epoch instead
    batches_iter = None
    if not args.debug and epochs > step_restored:
        batches_iter = device_batches(
            dataset_train, datapipe_train, dmesh, group=scan_steps,
            n_epochs=epochs - step_restored)
    for _ in range(step_restored, epochs):
        # ------ Train on all batches of this epoch ------
        # Losses stay ON DEVICE: per-step float()s would force a device
        # round trip per dispatch (measured ~90 ms/step through this TPU
        # tunnel), serializing the pipeline. One small sync per epoch
        # bounds the dispatch queue; the full sync + honest timing happen
        # at checkpoint boundaries.
        batch_loss = []
        n_batches = 0
        epoch_iter = batches_iter if batches_iter is not None else \
            device_batches(dataset_train, datapipe_train, dmesh,
                           group=scan_steps)
        for n_steps, _, arrays, epoch_done in epoch_iter:
            key, step_key = jax.random.split(key)
            if n_steps > 1:
                params, opt_state, losses = train_step_scan(
                    params, opt_state, arrays, step_key)
                loss = losses[-1]
                batch_loss.append(losses)
            else:
                params, opt_state, loss = train_step(
                    params, opt_state, arrays, step_key)
                batch_loss.append(loss)
            n_batches += n_steps
            if profile_left > 0:
                profile_left -= n_steps
                if profile_left <= 0:
                    jax.profiler.stop_trace()
                    logger.info("Profiler trace written")
            if args.debug:
                # The reference's check_numerics guards run in debug
                # mode; here the equivalent is a hard finite check
                assert np.isfinite(float(loss)), \
                    "Loss went non-finite: %r" % float(loss)
                logger.warn("Debug mode: skipping the rest of this epoch")
                break
            if epoch_done:
                break
        assert n_batches, "Dataset is empty"
        # Backpressure: one scalar readback per epoch keeps the host
        # from enqueuing unboundedly far ahead of the device -- and
        # doubles as a per-epoch NaN guard
        last_loss = float(np.atleast_1d(
            jax.device_get(batch_loss[-1]))[-1])
        assert np.isfinite(last_loss), \
            "Loss went non-finite at epoch %d: %r" % (step + 1, last_loss)
        step += 1
        period_batches += n_batches

        # ------ Checkpoint + train summaries (host 0 only) ------
        if step % ckpt_period == 0 and is_lead:
            # Full sync: losses of THIS epoch + wall time of the period
            batch_loss = list(np.hstack([
                np.atleast_1d(l) for l in jax.device_get(batch_loss)]))
            elapsed = time() - period_t0
            saved = ckptmanager.save(
                step, {'params': jax.device_get(params),
                       'opt_state': jax.device_get(opt_state)})
            logger.info("Checkpointed epoch %d:\n\t%s", step, saved)
            writer_train.scalars(
                step, loss_train=np.mean(batch_loss),
                batch_time_train=elapsed / max(period_batches, 1),
                rays_per_sec=dataset_train.bs * period_batches / elapsed)
            maintain_epoch_queue(
                train_epoch_deque, train_vis_epoch_dir.format(e=step))
            period_t0 = time()
            period_batches = 0

        # ------ Validation ------
        if datapipe_vali is not None and vali_period > 0 \
                and step % vali_period == 0:
            batch_loss, vis_dirs = [], []
            epoch_dir = vali_vis_epoch_dir.format(e=step)
            for batch_i, batch in enumerate(datapipe_vali):
                meta, arrays = split_batch(dataset_vali, batch)
                # Multi-host: every host validates the same replicated
                # batches (collectives need all hosts; outputs stay
                # addressable); only host 0 writes artifacts
                if jax.process_count() > 1:
                    arrays = meshlib.replicate(arrays, dmesh)
                else:
                    arrays = meshlib.shard_batch(arrays, dmesh)
                key, step_key = jax.random.split(key)
                loss, to_vis = vali_step(params, arrays, step_key)
                batch_loss.append(float(loss))
                if not is_lead:
                    continue
                to_vis_np = {k: np.asarray(v) for k, v in to_vis.items()}
                to_vis_np.update(meta)
                vis_dir = join(epoch_dir, 'batch{b:09d}'.format(b=batch_i))
                model.vis_batch(to_vis_np, vis_dir, mode='vali')
                vis_dirs.append(vis_dir)
            if is_lead:
                writer_vali.scalars(step, loss_vali=np.mean(batch_loss))
                comp_f = join(epoch_dir, 'all')
                view_at = model.compile_batch_vis(vis_dirs, comp_f,
                                                  mode='vali')
                if view_at is not None:
                    writer_vali.text(step, 'vis_vali', view_at)
                maintain_epoch_queue(vali_epoch_deque, epoch_dir)

    if profile_left > 0:
        # Fewer steps ran than requested; close the trace cleanly
        jax.profiler.stop_trace()
        logger.info("Profiler trace written (training ended first)")
    writer_train.flush()
    writer_vali.flush()
    logger.info("Training done (%d epochs)", epochs)
    if args.multihost:
        # Orderly teardown: the coordinator must outlive the other
        # processes' final barrier, and abrupt exits log heartbeat
        # warnings
        jax.distributed.shutdown()


if __name__ == '__main__':
    main()
