"""Distills a trained NeRF into per-view geometry buffers: alpha, surface
xyz, normals (via the sigma gradient), and light visibility.

CLI parity with the reference's geometry_from_nerf.py:
  python -m nerfactor_tpu.geometry_from_nerf \
      --trained_nerf=/out/lego/lr5e-4 --data_root=/data/lego \
      --out_root=/out/lego_geom --imh=256 --light_h=16 [--spp=1] ...

TPU-first design vs the reference:
  * normals come from one ``jax.grad`` of the sigma MLP (reference: a
    per-chunk batch_jacobian loop, geometry_from_nerf.py:284-300);
  * the light-visibility pass marches (surf_pts x ALL light pixels) as
    dense, where-masked batched compute inside one jitted function --
    the reference loops lpix_chunk=1 light pixels in Python (:192) and
    boolean-masks front-lit pairs dynamically; we compute the full grid
    in fixed-size pair blocks and mask, which keeps shapes static for
    XLA and the MXU fed;
  * ``--lpix_chunk`` is accepted for CLI parity but unused (all light
    pixels go in one pass);
  * blocks are dispatched as jitted ``lax.map`` SUPER-blocks with the
    device->host conversion lagging one super behind, so the tunneled
    per-dispatch RTT and result transfers hide behind compute
    (measured round 4, tools/march_probe: per-block sync costs ~25 ms
    RTT against ~9 ms of device work -- a 3.8x wall-clock tax on the
    stage that dominates the published pipeline);
  * per-view buffer writes (PNG/mp4 encode + the HxWx512 lvis.npy)
    run on a background writer thread, overlapped with the next
    view's device compute.
"""

import argparse
import os
import queue
import threading
from os.path import join, basename, exists

import jax
import jax.numpy as jnp
import numpy as np

from nerfactor_tpu import datasets, models
from nerfactor_tpu.ops import sampling
from nerfactor_tpu.ops import img as imgops
from nerfactor_tpu.ops.light import gen_light_xyz
from nerfactor_tpu.utils import buffers, config as configutil, io as ioutil
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="geometry_from_nerf")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--trained_nerf', required=True,
                   help="trained NeRF dir up to and incl. the lr folder")
    p.add_argument('--data_root', default='', help="input data root")
    p.add_argument('--out_root', required=True, help="output root")
    p.add_argument('--imh', type=int, default=None)
    p.add_argument('--scene_bbox', default=None,
                   help="x_min,x_max,y_min,y_max,z_min,z_max for real scenes")
    p.add_argument('--lvis_far', type=float, default=1.0)
    p.add_argument('--occu_thres', type=float, default=0.0)
    p.add_argument('--light_h', type=int, default=16)
    p.add_argument('--mlp_chunk', type=int, default=1_048_576,
                   help="flattened sample rows per jitted block")
    p.add_argument('--lpix_chunk', type=int, default=1,
                   help="accepted for CLI parity; unused (all light "
                        "pixels are marched in one dense pass)")
    p.add_argument('--spp', type=int, default=1)
    p.add_argument('--lvis_dtype', default='float32',
                   choices=['float32', 'float16'],
                   help="on-disk dtype of lvis.npy (f16 halves the "
                        "largest buffer; loaders accept both)")
    p.add_argument('--fps', type=int, default=12)
    p.add_argument('--bf16_march', action=argparse.BooleanOptionalAction,
                   default=True,
                   help="run the (surface x 512 lights x samples)-scale "
                        "sigma evals of the visibility march in bf16 "
                        "(eval-only; transmittance accumulation stays "
                        "f32; the differentiated depth/normal pass "
                        "always runs f32). Measured on v5e: 27.6 -> "
                        "17.0 s per 4096 points x 512 dirs, lvis drift "
                        "p99 < 0.005")
    p.add_argument('--view_shard', default='0/1',
                   help="'i/n': process only every n-th view starting at "
                        "i -- distillation is embarrassingly parallel "
                        "over views, so n hosts each run one shard "
                        "(the reference ships this sequential, "
                        "nerfactor/README.md:122-125)")
    p.add_argument('--debug', action='store_true')
    return p.parse_args(argv)


def _parse_bbox(scene_bbox):
    if not scene_bbox:
        return None
    vals = [float(x) for x in scene_bbox.split(',')]
    assert len(vals) == 6, "scene_bbox needs 6 comma-separated floats"
    return np.array(vals, np.float32)


def _in_bounds_mask(pts, bbox, channel_axis=-1):
    """Per-point bbox mask; ``channel_axis=0`` for (3, N) transposed
    points (the march's kernel boundary layout)."""
    if bbox is None:
        shape = pts.shape[1:] if channel_axis == 0 else pts.shape[:-1]
        return jnp.ones(shape, dtype=bool)
    take = ((lambda c: pts[c]) if channel_axis == 0
            else (lambda c: pts[..., c]))
    in_x = (take(0) >= bbox[0]) & (take(0) <= bbox[1])
    in_y = (take(1) >= bbox[2]) & (take(1) <= bbox[3])
    in_z = (take(2) >= bbox[4]) & (take(2) <= bbox[5])
    return in_x & in_y & in_z


class GeometryDistiller:
    """Holds the restored NeRF + jitted per-block kernels."""

    def __init__(self, model, params, config, args):
        self.model = model
        self.params = params
        self.args = args
        self.bbox = _parse_bbox(args.scene_bbox)
        self.near = config.getfloat('near')
        self.far = config.getfloat('far')
        self.lin_in_disp = config.getboolean('lin_in_disp')
        # NOTE: reference adds 64 to both sample counts for distillation
        # (geometry_from_nerf.py:250-251, 178-179)
        self.n_coarse = 64 + config.getint('n_samples_coarse')
        self.n_fine = 64 + config.getint('n_samples_fine')
        light_w = 2 * args.light_h
        lxyz, lareas = gen_light_xyz(args.light_h, light_w)
        self.lxyz = jnp.asarray(lxyz.reshape(-1, 3), jnp.float32)
        self.n_lights = self.lxyz.shape[0]
        # Block sizes (static shapes for jit)
        self.ray_block = max(512, args.mlp_chunk // max(
            self.n_coarse + self.n_fine, 1))
        # Visibility-march blocks want to be LARGE: measured on v5e at
        # 96px/512 lights, marching 4096 surface points takes 177 s at
        # 1 point/block (dispatch-bound) vs 27.5 s at 36 points/block
        # (saturated). At full nerf.ini scale (256x8 MLP, 320 samples)
        # the multiplier was re-measured: 8*mlp_chunk (50 points/block)
        # runs 13.1 -> 10.4 s per 4096 points x 512 dirs vs 4*, with
        # 16* only marginally better (10.0 s) -- 8* keeps HBM headroom
        # (the march is eval-only bf16; peak activations ~= a few GB at
        # the default mlp_chunk). Shrink mlp_chunk on OOM (reference
        # guidance, nerfactor/README.md:119).
        self.pair_block = max(256, 8 * args.mlp_chunk // max(
            self.n_coarse + self.n_fine, 1))
        self.lvis_block_pts = max(1, self.pair_block // self.n_lights)
        self._depth_normal_block = jax.jit(self._depth_normal_block_fn)
        self._lvis_block = jax.jit(self._lvis_block_fn)
        # Super-dispatch: one jitted lax.map over a fixed number of
        # blocks per call, so each tunneled dispatch carries ~1 s of
        # device work and ONE result transfer. Measured round 4
        # (tools/march_probe, flagship shapes): per-block sync is
        # ~34 ms wall against ~9 ms device; supers + lag-1 conversion
        # recover the device-limited rate.
        self._lvis_super_k = -(-2048 // self.lvis_block_pts)
        self._dn_super_k = -(-16384 // self.ray_block)
        self._depth_normal_super = jax.jit(lambda o, d: jax.lax.map(
            lambda t: self._depth_normal_block_fn(*t), (o, d)))
        self._lvis_super = jax.jit(lambda s, n: jax.lax.map(
            lambda t: self._lvis_block_fn(*t), (s, n)))

    @staticmethod
    def _eff_super_k(n, block, k):
        """Supers per dispatch for an n-row input: the full ``k`` when
        the input fills at least one super, else the smallest power of
        two that covers it -- so a sparse view pays at most ~2x its own
        size in padding instead of a whole super, while the number of
        distinct compiled shapes stays bounded at log2(k)."""
        need = max(1, -(-n // block))
        if need >= k:
            return k
        k_eff = 1
        while k_eff < need:
            k_eff *= 2
        return k_eff

    def _super_mapped(self, fn, block_fn, inputs, block, k):
        """Runs jitted ``fn`` over (n, ...) host arrays as (k, block,
        ...) supers, converting each result one super BEHIND the
        dispatches so transfers ride under compute. Inputs that fit a
        single block skip the super machinery and reuse the already-
        jitted ``block_fn``. Returns (n, ...) numpy outputs
        (tuple-structured if ``fn`` returns a tuple)."""
        n = inputs[0].shape[0]
        if n <= block:
            pad = block - n
            padded = [
                np.concatenate([a, np.repeat(a[-1:], pad, 0)], 0)
                if pad else a for a in inputs]
            res = block_fn(*(jnp.asarray(a) for a in padded))
            return jax.tree_util.tree_map(
                lambda x: np.asarray(x)[:n], res)
        k = self._eff_super_k(n, block, k)
        sup = block * k
        n_sup = max(1, -(-n // sup))
        pad = n_sup * sup - n
        shaped = []
        for a in inputs:
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, 0)], 0)
            shaped.append(np.reshape(a, (n_sup, k, block) + a.shape[1:]))
        collected, pending = [], None
        for i in range(n_sup):
            res = fn(*(jnp.asarray(a[i]) for a in shaped))
            if pending is not None:
                collected.append(
                    jax.tree_util.tree_map(np.asarray, pending))
            pending = res
        collected.append(jax.tree_util.tree_map(np.asarray, pending))

        def merge(*xs):
            flat = np.concatenate(
                [np.reshape(x, (-1,) + x.shape[2:]) for x in xs], axis=0)
            return flat[:n]

        return jax.tree_util.tree_map(merge, *collected)

    # ------ camera -> object ------

    def _sigma_with_bounds(self, pts_flat, use_fine, compute_dtype=None,
                           input_t=False):
        """``input_t=True``: pts_flat is (3, N) in the fused kernel's
        transposed boundary layout (built by broadcasting, never by
        transposing -- the march profile showed XLA lowers the 24 MB
        (N, 3) -> (3, N) transpose as a per-component loop costing
        ~1.4 ms of a 8.9 ms block; QUALITY.md round 5)."""
        sigma = jax.nn.relu(
            self.model.eval_sigma(self.params, pts_flat, use_fine=use_fine,
                                  compute_dtype=compute_dtype,
                                  input_t=input_t))
        if self.bbox is not None:
            inb = _in_bounds_mask(pts_flat, jnp.asarray(self.bbox),
                                  channel_axis=0 if input_t else -1)
            sigma = jnp.where(inb[:, None], sigma, 0.0)
        return sigma

    def _depth_normal_block_fn(self, rayo, rayd):
        """(B, 3) x2 -> occu (B,), exp_depth (B,), exp_normal (B, 3).

        All points tensors are BUILT in the kernel's (3, B*S) boundary
        layout (pure broadcasts over transposed (3, B) ray tensors) --
        never produced row-major and transposed after."""
        rayd = rayd / jnp.maximum(
            jnp.linalg.norm(rayd, axis=1, keepdims=True), 1e-12)
        n = rayo.shape[0]
        rayo_t = rayo.T  # (3, B): tiny -- the per-RAY transpose is free
        rayd_t = rayd.T
        z = sampling.gen_z(self.near, self.far, self.n_coarse, n,
                           lin_in_disp=self.lin_in_disp)
        pts_t = (rayo_t[:, :, None]
                 + rayd_t[:, :, None] * z[None, :, :]).reshape(3, -1)
        sigma = self._sigma_with_bounds(
            pts_t, use_fine=False,
            input_t=True).reshape(n, self.n_coarse)
        weights = sampling.accumulate_sigma(sigma, z, rayd)
        z = sampling.gen_z_fine(z, weights, self.n_fine)
        pts_t = (rayo_t[:, :, None]
                 + rayd_t[:, :, None] * z[None, :, :]).reshape(3, -1)

        # Fine sigma + its spatial gradient in ONE reverse-mode pass:
        # sigma at a point depends only on that point, so grad of the sum
        # gives per-point Jacobian rows (here: columns).
        def sigma_sum(p_t):
            s = self._sigma_with_bounds(p_t, use_fine=True, input_t=True)
            return jnp.sum(s), s

        grads_t, sigma_flat = jax.grad(sigma_sum, has_aux=True)(pts_t)
        normal_t = -grads_t / jnp.maximum(
            jnp.linalg.norm(grads_t, axis=0, keepdims=True), 1e-12)
        n_total = z.shape[1]
        sigma = sigma_flat.reshape(n, n_total)
        normal = normal_t.reshape(3, n, n_total)
        weights = sampling.accumulate_sigma(sigma, z, rayd)
        occu = jnp.sum(weights, axis=-1)
        exp_depth = jnp.sum(weights * z, axis=-1)
        # (3, B, S) x (B, S) -> (B, 3): a reduction over samples, so no
        # big transposed intermediate materializes
        exp_normal = jnp.einsum('cns,ns->nc', normal, weights)
        return occu, exp_depth, exp_normal

    def compute_depth_and_normal(self, rayo, rayd):
        """Super-blocked host loop over fixed ray blocks."""
        return self._super_mapped(
            self._depth_normal_super, self._depth_normal_block,
            [rayo, rayd], self.ray_block, self._dn_super_k)

    # ------ object -> light ------

    def _lvis_block_fn(self, surf, normal):
        """(S, 3) x2 -> (S, L) light visibility; marches ALL light pixels
        for the block's surface points as one dense, masked batch.

        The (surface x light) ray tensors and every points tensor are
        BUILT component-major -- (3, S, L) / (3, S*L*samples) -- so the
        fused sigma kernel's transposed boundary is fed directly with
        pure broadcasts (no (N, 3) -> (3, N) transpose of the ~24 MB
        points operand; QUALITY.md round-5 march profile)."""
        s = surf.shape[0]
        surf_t = surf.T  # (3, S): per-POINT transposes are tiny
        lxyz_t = self.lxyz.T  # (3, L)
        surf2l_t = lxyz_t[:, None, :] - surf_t[:, :, None]  # (3, S, L)
        surf2l_t = surf2l_t / jnp.maximum(
            jnp.linalg.norm(surf2l_t, axis=0, keepdims=True), 1e-12)
        front_lit = jnp.einsum('csl,sc->sl', surf2l_t, normal) > 0
        # o repeats each surface point over L; d flattens (3, S, L)
        o_t = jnp.broadcast_to(
            surf_t[:, :, None], (3, s, self.n_lights)).reshape(3, -1)
        d_t = surf2l_t.reshape(3, -1)  # (3, S*L)
        n_pairs = s * self.n_lights
        d_rows = d_t.T  # (S*L, 3) for accumulate_sigma's norm (unit)
        march_dt = jnp.bfloat16 if self.args.bf16_march else None
        z = sampling.gen_z(0.1, self.args.lvis_far, self.n_coarse, n_pairs,
                           lin_in_disp=self.lin_in_disp)
        pts_t = (o_t[:, :, None]
                 + d_t[:, :, None] * z[None, :, :]).reshape(3, -1)
        sigma = self._sigma_with_bounds(
            pts_t, use_fine=False, compute_dtype=march_dt,
            input_t=True).reshape(n_pairs, self.n_coarse)
        weights = sampling.accumulate_sigma(sigma, z, d_rows)
        z = sampling.gen_z_fine(z, weights, self.n_fine)
        pts_t = (o_t[:, :, None]
                 + d_t[:, :, None] * z[None, :, :]).reshape(3, -1)
        sigma = self._sigma_with_bounds(
            pts_t, use_fine=True, compute_dtype=march_dt,
            input_t=True).reshape(n_pairs, z.shape[1])
        weights = sampling.accumulate_sigma(sigma, z, d_rows)
        occu = jnp.sum(weights, axis=-1).reshape(s, self.n_lights)
        lvis = 1.0 - occu
        return jnp.where(front_lit, lvis, 0.0)

    def compute_light_visibility(self, surf, normal):
        if surf.shape[0] == 0:
            return np.zeros((0, self.n_lights), np.float32)
        lvis = self._super_mapped(
            self._lvis_super, self._lvis_block, [surf, normal],
            self.lvis_block_pts, self._lvis_super_k)
        return np.clip(lvis, 0.0, 1.0)


class AsyncWriter:
    """One background thread for per-view buffer writes, so the host-
    side PNG/mp4 encoding and the HxWx512 lvis.npy write overlap the
    next view's device compute. maxsize bounds the in-flight lvis
    buffers (~0.5 GB each at 512px)."""

    def __init__(self, maxsize=2):
        self._q = queue.Queue(maxsize=maxsize)
        self._err = None
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        while True:
            fn = self._q.get()
            if fn is None:
                return
            try:
                fn()
            except Exception as e:  # re-raised on the main thread
                logger.error("Background buffer write failed: %r", e)
                if self._err is None:  # keep the FIRST failure
                    self._err = e

    def submit(self, fn):
        if self._err is not None:
            raise self._err
        # A BaseException (SystemExit etc.) escaping a write fn kills
        # the worker without setting _err; without this liveness check a
        # full queue would then block forever instead of surfacing it
        while True:
            if not self._t.is_alive():
                raise RuntimeError(
                    "Background writer thread died (BaseException in a "
                    "buffer write); see the log above")
            try:
                self._q.put(fn, timeout=5)
                return
            except queue.Full:
                continue

    def close(self):
        while self._t.is_alive():
            try:
                self._q.put(None, timeout=5)
                break
            except queue.Full:
                continue
        self._t.join()
        if self._err is not None:
            raise self._err


def average_supersamples(map_ss, sps):
    if sps == 1:
        return map_ss
    maps = [map_ss[i::sps, j::sps, ...]
            for i in range(sps) for j in range(sps)]
    return np.mean(np.stack(maps, axis=0), axis=0)


def process_view(distiller, batch, out_root, args, writer=None):
    import time as _time
    sps = int(np.sqrt(args.spp))
    id_ = batch['id']
    hw = tuple(int(x) for x in batch['hw'])
    rayo = np.asarray(batch['rayo'], np.float32)
    rayd = np.asarray(batch['rayd'], np.float32)
    rayd = rayd / np.linalg.norm(rayd, axis=1, keepdims=True)

    out_dir = join(out_root, id_)
    os.makedirs(out_dir, exist_ok=True)
    expected = [join(out_dir, f) for f in (
        'alpha.png', 'lvis.npy', 'lvis.png', 'normal.npy', 'normal.png',
        'xyz.npy', 'xyz.png')]
    if all(exists(x) for x in expected):
        logger.info("Skipping %s since it's done already", id_)
        return

    t0 = _time.perf_counter()
    occu, exp_depth, exp_normal = distiller.compute_depth_and_normal(
        rayo, rayd)
    t_dn = _time.perf_counter() - t0
    occu = np.where(occu < args.occu_thres, 0.0, occu)

    hw_ss = (hw[0] * sps, hw[1] * sps)
    alpha_map = average_supersamples(occu.reshape(hw_ss), sps)
    alpha_map = np.clip(alpha_map, 0.0, 1.0)

    surf = rayo + rayd * exp_depth[:, None]
    xyz_map = average_supersamples(surf.reshape(hw_ss + (3,)), sps)
    xyz_map = imgops.alpha_blend(xyz_map, alpha_map)

    normal_map = average_supersamples(exp_normal.reshape(hw_ss + (3,)), sps)
    # Background normals filled with (0, 1, 0): (0, 0, 0) would produce
    # zero tangents downstream (reference geometry_from_nerf.py:140-144)
    normal_bg = np.tile(np.array([0.0, 1.0, 0.0], np.float32),
                        hw + (1,)).reshape(hw + (3,))
    normal_map = imgops.alpha_blend(normal_map, alpha_map, normal_bg)
    norm = np.linalg.norm(normal_map, axis=2, keepdims=True)
    normal_map = normal_map / np.maximum(norm, 1e-12)
    normal_map = np.clip(normal_map, -1.0, 1.0)

    # Surface -> light visibility, only for hit pixels
    hit = alpha_map.reshape(-1) > 0
    surf_hit = surf.reshape(hw_ss + (3,))
    surf_hit = average_supersamples(surf_hit, sps).reshape(-1, 3)[hit]
    normal_hit = normal_map.reshape(-1, 3)[hit]
    t1 = _time.perf_counter()
    lvis_hit = distiller.compute_light_visibility(surf_hit, normal_hit)
    t_lvis = _time.perf_counter() - t1
    logger.info(
        "%s: depth/normal %.1f s (%d rays), lvis %.1f s (%d hit pts x "
        "%d dirs), host glue %.1f s", id_, t_dn, rayo.shape[0], t_lvis,
        int(surf_hit.shape[0]), distiller.n_lights,
        t1 - t0 - t_dn)
    n_lights = lvis_hit.shape[1]
    lvis = np.zeros(hw + (n_lights,), dtype=np.float32)
    lvis[hit.reshape(hw)] = lvis_hit
    lvis *= alpha_map.reshape(hw + (1,))

    def write_all():
        buffers.write_alpha(alpha_map, out_dir)
        buffers.write_xyz(xyz_map, out_dir)
        buffers.write_normal(normal_map, out_dir)
        buffers.write_lvis(lvis, args.fps, out_dir,
                           dtype=np.dtype(args.lvis_dtype))

    if writer is None:
        write_all()
    else:
        writer.submit(write_all)


def main(argv=None):
    args = parse_args(argv)
    ckpts = ioutil.sortglob(join(args.trained_nerf, 'checkpoints'),
                            'ckpt-*.npz')
    assert ckpts, "No checkpoint under %s" % args.trained_nerf
    ckpt_ind = [int(basename(x)[len('ckpt-'):-len('.npz')]) for x in ckpts]
    latest_ckpt = ckpts[int(np.argmax(ckpt_ind))][:-len('.npz')]
    config_ini = configutil.get_config_ini(latest_ckpt)
    parser = configutil.read_config(config_ini)
    if args.imh is not None:
        parser.set('DEFAULT', 'imh', str(args.imh))
    if args.data_root:
        parser.set('DEFAULT', 'data_root', args.data_root)
    config = configutil.Config(parser)

    Model = models.get_model_class(config.get('model'))
    model = Model(config)
    from nerfactor_tpu.explore_brdf_space import restore_model
    params = restore_model(model, latest_ckpt)
    distiller = GeometryDistiller(model, params, config, args)

    shard_i, shard_n = (int(x) for x in args.view_shard.split('/'))
    assert 0 <= shard_i < shard_n, "--view_shard must be 'i/n' with i<n"

    Dataset = datasets.get_dataset_class(config.get('dataset'))
    from nerfactor_tpu.trainvali import split_batch
    import time as _time
    view_i = 0
    writer = AsyncWriter()
    try:
        for mode in ('train', 'vali', 'test'):
            try:
                dataset = Dataset(config, mode, always_all_rays=True,
                                  spp=args.spp)
            except FileNotFoundError:
                logger.warn("No '%s' views; skipping", mode)
                continue
            datapipe = dataset.build_pipeline(no_shuffle=True)
            t_prev = _time.perf_counter()
            for batch in datapipe:
                if view_i % shard_n != shard_i:
                    view_i += 1
                    continue
                view_i += 1
                t_loaded = _time.perf_counter()
                meta, arrays = split_batch(dataset, batch)
                full = dict(meta)
                full.update(arrays)
                process_view(distiller, full, args.out_root, args,
                             writer=writer)
                t_done = _time.perf_counter()
                logger.info(
                    "%s: view wall %.1f s (data load %.1f s)",
                    full['id'], t_done - t_prev, t_loaded - t_prev)
                t_prev = t_done
                if args.debug:
                    break
    finally:
        writer.close()


if __name__ == '__main__':
    main()
