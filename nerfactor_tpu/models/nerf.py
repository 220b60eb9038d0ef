"""Vanilla NeRF (coarse + fine) -- stage 1 of the pipeline.

Reference behavior: nerfactor/models/nerf.py. Architecture: per level, an
8x256 ReLU encoder with input-skip at depth/2 over posenc(xyz, 10), a
1-wide sigma head (ReLU applied at accumulation), a 256-wide linear
bottleneck, and a [128, 3] rgb head over bottleneck (+) posenc(view, 4).

TPU-first notes: no mlp_chunk Python loops -- training evaluates all
(rays x samples) in one fused pass; evaluation lax.map's over static ray
chunks sized so each chunk saturates the MXU while bounding activation
memory.
"""

from os.path import join, exists

import jax
import jax.numpy as jnp
import numpy as np

from nerfactor_tpu.models.base import BaseModel
from nerfactor_tpu.models import networks
from nerfactor_tpu.ops import encoding, sampling
from nerfactor_tpu.ops import img as imgops
from nerfactor_tpu.ops import pallas_mlp, pallas_nerf
from nerfactor_tpu.utils import io as ioutil, vis as visutil, metrics
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="models/nerf")


class Model(BaseModel):
    def __init__(self, config, debug=False):
        super().__init__(config, debug=debug)
        self.use_views = config.getboolean('use_views')
        self.near = config.getfloat('near')
        self.far = config.getfloat('far')
        self.n_samples_coarse = config.getint('n_samples_coarse')
        self.n_samples_fine = config.getint('n_samples_fine')
        self.lin_in_disp = config.getboolean('lin_in_disp')
        self.perturb = config.getboolean('perturb')
        self.noise_std = config.getfloat('noise_std', fallback=0.0)
        self.white_bg = config.getboolean('white_bg')
        self.pos_enc = config.getboolean('pos_enc')
        self.n_freqs_xyz = config.getint('n_freqs_xyz')
        self.n_freqs_view = config.getint('n_freqs_view')
        mlp_width = config.getint('mlp_width')
        enc_depth = config.getint('enc_depth')
        self.act = config.get('act', fallback='relu')
        xyz_dims = encoding.embed_dims(3, self.n_freqs_xyz) \
            if self.pos_enc else 3
        view_dims = encoding.embed_dims(3, self.n_freqs_view) \
            if (self.pos_enc and self.use_views) else 3
        self.specs = {
            'enc': networks.MLPSpec(
                xyz_dims, [mlp_width] * enc_depth, acts=self.act,
                skip_at=[enc_depth // 2]),
        }
        enc_out = self.specs['enc'].out_dim
        if self.use_views:
            self.specs['sigma_out'] = networks.MLPSpec(
                enc_out, [1], acts=None)
            self.specs['bottleneck'] = networks.MLPSpec(
                enc_out, [mlp_width], acts=None)
            self.specs['rgb_out'] = networks.MLPSpec(
                mlp_width + view_dims, [mlp_width // 2, 3],
                acts=[self.act, None])
        else:
            self.specs['rgbs_out'] = networks.MLPSpec(
                enc_out, [4], acts=None)
        # bf16 activations for the (rays x samples)-scale MLP evals
        # (same lever as the shape/joint models' bf16_big_chains; the
        # sigma->weights accumulation, compositing, and losses stay f32,
        # and geometry distillation's eval_sigma always runs f32)
        self.big_chain_dtype = jnp.bfloat16 if config.getboolean(
            'bf16_big_chains', fallback=False) else None
        # Fused Pallas evaluation (transposed-boundary kernels): the
        # branched trunk->{sigma, bottleneck}->(+views)->rgb topology
        # runs as ONE kernel (ops/pallas_nerf.py); the sigma-only
        # subset (geometry distillation) as a generic fused chain.
        # Off-TPU both fall back to pinned-equivalent reference math.
        self.fused_mlp = config.getboolean('fused_mlp', fallback=False)
        nf_xyz = self.n_freqs_xyz if self.pos_enc else 0
        nf_view = self.n_freqs_view \
            if (self.pos_enc and self.use_views) else 0
        if self.use_views:
            self.nerf_plan = pallas_nerf.make_nerf_plan(
                nf_xyz, nf_view, mlp_width, enc_depth, enc_depth // 2,
                self.act, (mlp_width // 2, 3), (self.act, None))
        else:
            self.rgbs_plan = pallas_mlp.plan_from_specs(
                [(3, nf_xyz)], self.specs['enc'],
                self.specs['rgbs_out'])
        sigma_head = 'sigma_out' if self.use_views else 'rgbs_out'
        self.sigma_plan = pallas_mlp.plan_from_specs(
            [(3, nf_xyz)], self.specs['enc'], self.specs[sigma_head])
        # Eval-time ray chunk: mlp_chunk counts flattened samples
        # (reference semantics); convert to rays.
        mlp_chunk = config.getint('mlp_chunk', fallback=1048576)
        n_total = self.n_samples_coarse + max(self.n_samples_fine, 0)
        self.eval_ray_chunk = max(256, mlp_chunk // max(n_total, 1))

    # ------ params ------

    def init_params(self, key):
        params = {}
        levels = ['coarse']
        if self.n_samples_fine > 0:
            levels.append('fine')
        for level in levels:
            for name, spec in self.specs.items():
                key, sub = jax.random.split(key)
                params['%s_%s' % (level, name)] = spec.init(sub)
        return params

    # ------ pure compute ------

    def _embed_xyz(self, pts):
        return encoding.posenc(pts, self.n_freqs_xyz) if self.pos_enc \
            else pts

    def _embed_view(self, views):
        if self.pos_enc and self.use_views:
            return encoding.posenc(views, self.n_freqs_view)
        return views

    @staticmethod
    def _pairs(layers):
        return [(l['w'], l['b']) for l in layers]

    def eval_nerf_at(self, params, pts, views, use_fine=False):
        """(n_rays, n_samples, 3) x2 -> (n_rays, n_samples, 4) raw rgbs."""
        pref = 'fine_' if use_fine else 'coarse_'
        dt = self.big_chain_dtype
        shape = pts.shape[:2]
        if self.fused_mlp:
            if self.use_views:
                p = (self._pairs(params[pref + 'enc']),
                     self._pairs(params[pref + 'sigma_out']),
                     self._pairs(params[pref + 'bottleneck']),
                     self._pairs(params[pref + 'rgb_out']))
                rgb, sigma = pallas_nerf.apply_nerf(
                    self.nerf_plan, pts.reshape(-1, 3),
                    views.reshape(-1, 3), p, compute_dtype=dt)
                return jnp.concatenate(
                    [rgb, sigma], axis=-1).reshape(shape + (4,))
            p = pallas_mlp.params_from_tree(
                params[pref + 'enc'], params[pref + 'rgbs_out'])
            rgbs = pallas_mlp.apply_chain(
                self.rgbs_plan, pts.reshape(-1, 3), p,
                compute_dtype=dt, needs_dx=False)
            return rgbs.reshape(shape + (4,))
        pts_flat = pts.reshape(-1, 3)
        pts_embed = self._embed_xyz(pts_flat)
        feat = self.specs['enc'].apply(params[pref + 'enc'], pts_embed,
                                       compute_dtype=dt)
        if self.use_views:
            views_flat = views.reshape(-1, 3)
            views_embed = self._embed_view(views_flat)
            sigma = self.specs['sigma_out'].apply(
                params[pref + 'sigma_out'], feat, compute_dtype=dt)
            bott = self.specs['bottleneck'].apply(
                params[pref + 'bottleneck'], feat, compute_dtype=dt)
            rgb = self.specs['rgb_out'].apply(
                params[pref + 'rgb_out'],
                jnp.concatenate((bott, views_embed), axis=-1),
                compute_dtype=dt)
            rgbs = jnp.concatenate((rgb, sigma), axis=-1)
        else:
            rgbs = self.specs['rgbs_out'].apply(
                params[pref + 'rgbs_out'], feat, compute_dtype=dt)
        return rgbs.reshape(shape + (4,))

    def eval_sigma(self, params, pts_flat, use_fine=False,
                   compute_dtype=None, input_t=False):
        """sigma (pre-ReLU) at flat points -- used by geometry
        distillation. (N, 3) -> (N, 1); with ``input_t=True``,
        pts_flat arrives as (3, N) in the fused kernel's transposed
        boundary layout (the march builds its points tensor that way,
        avoiding an XLA-side 24 MB transpose per block).

        ``compute_dtype`` is only passed by the (eval-only) visibility
        march; the depth/normal pass differentiates through this and
        always runs f32.

        eval_sigma is never trained through (training goes via
        eval_nerf_at), so the fused path declares needs_dw=False: the
        sigma-gradient normal pass (jax.grad w.r.t. the points) gets
        its input cotangents without paying for weight gradients.
        """
        pref = 'fine_' if use_fine else 'coarse_'
        if self.fused_mlp:
            head = 'sigma_out' if self.use_views else 'rgbs_out'
            p = pallas_mlp.params_from_tree(
                params[pref + 'enc'], params[pref + head])
            out = pallas_mlp.apply_chain(
                self.sigma_plan, pts_flat, p,
                compute_dtype=compute_dtype, needs_dw=False,
                input_t=input_t)
            return out[:, -1:]
        if input_t:
            pts_flat = pts_flat.T
        feat = self.specs['enc'].apply(
            params[pref + 'enc'], self._embed_xyz(pts_flat),
            compute_dtype=compute_dtype)
        head = 'sigma_out' if self.use_views else 'rgbs_out'
        out = self.specs[head].apply(params[pref + head], feat,
                                     compute_dtype=compute_dtype)
        return out[:, -1:]  # rgbs_out packs sigma last

    def render_rays(self, params, rayo, rayd, mode='train', key=None):
        perturb = self.perturb if mode == 'train' else False
        keys = jax.random.split(key, 3) if key is not None else [None] * 3
        rayd = jnp.asarray(rayd)
        rayd = rayd / jnp.maximum(
            jnp.linalg.norm(rayd, axis=1, keepdims=True), 1e-12)
        n_rays = rayo.shape[0]
        z = sampling.gen_z(
            self.near, self.far, self.n_samples_coarse, n_rays,
            lin_in_disp=self.lin_in_disp, perturb=perturb, key=keys[0])
        pts = rayo[:, None, :] + rayd[:, None, :] * z[:, :, None]
        views = jnp.broadcast_to(rayd[:, None, :], pts.shape)
        rgbs = self.eval_nerf_at(params, pts, views, use_fine=False)
        weights = sampling.accumulate_sigma(
            rgbs[:, :, 3], z, rayd, noise_std=self.noise_std
            if mode == 'train' else 0.0, key=keys[1])
        coarse = sampling.accumulate(rgbs, z, weights, self.white_bg)
        if self.n_samples_fine <= 0:
            return coarse, {}
        z = sampling.gen_z_fine(
            z, weights, self.n_samples_fine, perturb=perturb, key=keys[2])
        pts = rayo[:, None, :] + rayd[:, None, :] * z[:, :, None]
        views = jnp.broadcast_to(rayd[:, None, :], pts.shape)
        rgbs = self.eval_nerf_at(params, pts, views, use_fine=True)
        weights = sampling.accumulate_sigma(rgbs[:, :, 3], z, rayd)
        fine = sampling.accumulate(rgbs, z, weights, self.white_bg)
        return coarse, fine

    # Known libtpu trap (tools/isolate_nerf8192.py, round 2): the f32
    # XLA fallback (fused_mlp=False AND bf16_big_chains=False) hits a
    # compiler RET_CHECK at n_rays=8192 train dispatches; <=4096 works,
    # and both the fused kernel and the bf16 XLA path are fine at 8192.
    F32_FALLBACK_RAY_LIMIT = 4096

    def _train_ray_limit(self, n_rays):
        """Ray cap per train dispatch, or None when no cap applies."""
        if self.fused_mlp or self.big_chain_dtype is not None:
            return None
        if n_rays <= self.F32_FALLBACK_RAY_LIMIT:
            return None
        return self.F32_FALLBACK_RAY_LIMIT

    def _render_rays_train_chunked(self, params, rayo, rayd, key, chunk):
        """Auto-chunks a train-mode render into <=chunk-ray dispatches
        (lax.map, per-chunk RNG keys) so the f32 XLA fallback can never
        user-trigger the 8192-ray libtpu crash documented in
        tools/isolate_nerf8192.py."""
        n = rayo.shape[0]
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n

        def pad_to(x):
            return jnp.concatenate(
                [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0) if pad else x

        rayo_c = pad_to(rayo).reshape(n_chunks, chunk, 3)
        rayd_c = pad_to(rayd).reshape(n_chunks, chunk, 3)
        if key is None:  # train steps always pass one; belt and braces
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, n_chunks)

        def f(args):
            o, d, k = args
            return self.render_rays(params, o, d, mode='train', key=k)

        coarse, fine = jax.lax.map(f, (rayo_c, rayd_c, keys))

        def unchunk(tree):
            return jax.tree_util.tree_map(
                lambda x: x.reshape((n_chunks * chunk,) + x.shape[2:])[:n],
                tree)

        return unchunk(coarse), unchunk(fine)

    def _render_rays_chunked(self, params, rayo, rayd, mode, key):
        """lax.map over static ray chunks for full-image evaluation."""
        n = rayo.shape[0]
        chunk = self.eval_ray_chunk
        if n <= chunk:
            return self.render_rays(params, rayo, rayd, mode=mode, key=key)
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n

        def pad_to(x):
            return jnp.concatenate(
                [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0) if pad else x

        rayo_c = pad_to(rayo).reshape(n_chunks, chunk, 3)
        rayd_c = pad_to(rayd).reshape(n_chunks, chunk, 3)

        def f(args):
            o, d = args
            return self.render_rays(params, o, d, mode=mode, key=key)

        coarse, fine = jax.lax.map(f, (rayo_c, rayd_c))

        def unchunk(tree):
            return jax.tree_util.tree_map(
                lambda x: x.reshape((n_chunks * chunk,) + x.shape[2:])[:n],
                tree)

        return unchunk(coarse), unchunk(fine)

    def apply(self, params, batch, mode='train', key=None):
        self._validate_mode(mode)
        rayo, rayd, rgb = batch['rayo'], batch['rayd'], batch['rgb']
        if mode == 'train':
            limit = self._train_ray_limit(rayo.shape[0])
            if limit is not None:
                logger.warn(
                    "f32 XLA fallback at n_rays=%d: auto-chunking train "
                    "dispatches to %d rays (libtpu RET_CHECK guard, see "
                    "tools/isolate_nerf8192.py)", rayo.shape[0], limit)
                coarse, fine = self._render_rays_train_chunked(
                    params, rayo, rayd, key, limit)
            else:
                coarse, fine = self.render_rays(
                    params, rayo, rayd, mode=mode, key=key)
        else:
            coarse, fine = self._render_rays_chunked(
                params, rayo, rayd, mode, key)
        pred = {'coarse': coarse['rgb'],
                'fine': fine.get('rgb', None) if fine else None}
        gt = rgb
        loss_kwargs = {}
        to_vis = {'gt_rgb': gt}
        for k, v in coarse.items():
            to_vis['coarse_' + k] = v
        for k, v in fine.items():
            to_vis['fine_' + k] = v
        return pred, gt, loss_kwargs, to_vis

    def compute_loss(self, params, pred, gt, **kwargs):
        loss = 0.0
        for weight, loss_func in self.wloss:
            loss = loss + weight * loss_func(gt, pred['coarse'],
                                             keep_batch=True)
            if pred['fine'] is not None:
                loss = loss + weight * loss_func(gt, pred['fine'],
                                                 keep_batch=True)
        return loss

    # ------ host-side vis ------

    def vis_batch(self, data_dict, outdir, mode='train', dump_raw_to=None):
        """Writes per-view PNGs; visualizes on the config background."""
        self._validate_mode(mode)
        if mode == 'train':
            return
        data_dict = dict(data_dict)
        hw = tuple(int(x) for x in data_dict.pop('hw'))
        id_ = data_dict.pop('id')
        imgs = {}
        for k, v in data_dict.items():
            v = np.asarray(v)
            if k.endswith('rgb'):
                imgs[k] = v.reshape(hw + (3,))
            elif k.endswith(('occu', 'depth', 'disp')):
                imgs[k] = v.reshape(hw)
            else:
                raise NotImplementedError(k)
        img_dict = {}
        for k, v in imgs.items():
            if k.endswith('depth'):
                im = (v - self.near) / (self.far - self.near)
                alpha = imgs[k.replace('depth', 'occu')]
                bg = np.ones_like(im) if self.white_bg else np.zeros_like(im)
                im = imgops.alpha_blend(im, alpha, bg)
            elif k.endswith('disp'):
                min_disp, max_disp = 1 / self.far, 1 / self.near
                im = (v - min_disp) / (max_disp - min_disp)
                alpha = imgs[k.replace('disp', 'occu')]
                bg = np.ones_like(im) if self.white_bg else np.zeros_like(im)
                im = imgops.alpha_blend(im, alpha, bg)
            elif k.endswith('occu'):
                im = 1 - v if self.white_bg else v
            else:
                im = v
            img_dict[k] = ioutil.write_img(im, join(outdir, k + '.png'))
        if mode == 'test':
            ioutil.write_json({'id': id_}, join(outdir, 'metadata.json'))
            return
        # pred-vs-gt + fine-vs-coarse flipbooks
        font_color = (0, 0, 0) if self.white_bg else (1.0, 1.0, 1.0)
        def lbl(img, text):
            return visutil.put_text(img, text, color=font_color)
        visutil.make_anim(
            (lbl(img_dict['gt_rgb'], "Ground Truth"),
             lbl(img_dict['fine_rgb'], "Prediction (fine)")),
            join(outdir, 'fine-vs-gt_rgb.apng'))
        for buf in ('rgb', 'depth', 'disp', 'occu'):
            visutil.make_anim(
                (lbl(img_dict['fine_' + buf], "Prediction (fine)"),
                 lbl(img_dict['coarse_' + buf], "Prediction (coarse)")),
                join(outdir, 'fine-vs-coarse_%s.apng' % buf))
        psnr = metrics.psnr(img_dict['gt_rgb'], img_dict['fine_rgb'],
                            drange='uint8')
        ioutil.write_json({'id': id_, 'psnr': psnr},
                          join(outdir, 'metadata.json'))

    def compile_batch_vis(self, batch_vis_dirs, outpref, mode='train',
                          fps=12):
        self._validate_mode(mode)
        if mode == 'train':
            return None
        viewer_prefix = self.config.get('viewer_prefix', fallback='')
        if mode == 'vali':
            outpath = outpref + '.html'
            self._compile_into_webpage(batch_vis_dirs, outpath)
        else:
            outpath = outpref + '.mp4'
            self._compile_into_video(batch_vis_dirs, outpath, fps=fps)
        return viewer_prefix + outpath

    def _compile_into_webpage(self, batch_dirs, out_html):
        rows = []
        for batch_dir in batch_dirs:
            metadata = ioutil.read_json(join(batch_dir, 'metadata.json'))
            rows.append([
                str(metadata),
                join(batch_dir, 'fine-vs-gt_rgb.apng'),
                join(batch_dir, 'fine-vs-coarse_rgb.apng'),
                join(batch_dir, 'fine-vs-coarse_depth.apng'),
                join(batch_dir, 'fine-vs-coarse_disp.apng'),
                join(batch_dir, 'fine-vs-coarse_occu.apng')])
        assert rows, "No row"
        caps = ["Metadata", "RGB", "RGB", "Depth", "Disparity", "Occupancy"]
        types = ['text'] + ['image'] * 5
        html = visutil.HTML(
            bgcolor='white' if self.white_bg else 'black',
            text_color='black' if self.white_bg else 'white')
        html.add_header("NeRF")
        table = html.add_table()
        for r in rows:
            table.add_row(r, types, captions=caps)
        html.save(out_html)

    def _compile_into_video(self, batch_dirs, out_mp4, fps=12):
        data_root = self.config.get('data_root')
        frames = {}
        for batch_dir in batch_dirs:
            json_path = join(batch_dir, 'metadata.json')
            pred_path = join(batch_dir, 'fine_rgb.png')
            if not exists(json_path) or not exists(pred_path):
                logger.warn("Skipping %s: missing files", batch_dir)
                continue
            id_ = ioutil.read_json(json_path)['id']
            pred = ioutil.load_img(pred_path)
            nn_paths = ioutil.sortglob(
                join(data_root, 'test_phys_nn'), id_ + '_nn_*.png')
            if len(nn_paths) == 1:
                nn = ioutil.load_img(nn_paths[0])
                frame = imgops.hconcat((pred, nn))
            else:
                frame = pred
            frames[id_] = frame
        frames_sorted = [frames[k] for k in sorted(frames)]
        visutil.make_video(frames_sorted, out_mp4, fps=fps)
