"""Shape model: surface MLPs distilling NeRF geometry -- normal(xyz) and
light-visibility(xyz, ldir) -- trained against the distilled buffers with
jitter-based smoothness regularization.

Reference behavior: nerfactor/models/shape.py. TPU-first: the (rays x 512
lights) lvis evaluation is one dense fused pass at train time and a
lax.map over static ray chunks at eval time (replacing chunk_apply's
scatter-update loop, shape.py:184-194).
"""

from os.path import join

import jax
import jax.numpy as jnp
import numpy as np

from nerfactor_tpu.models.base import BaseModel
from nerfactor_tpu.models import networks
from nerfactor_tpu.models.losses import mse_lastdim, mae_lastdim
from nerfactor_tpu.ops import encoding
from nerfactor_tpu.ops import img as imgops
from nerfactor_tpu.ops import pallas_mlp
from nerfactor_tpu.ops.light import gen_light_xyz
from nerfactor_tpu.ops.math import safe_l2_normalize
from nerfactor_tpu.utils import io as ioutil, vis as visutil
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="models/shape")


class Model(BaseModel):
    def __init__(self, config, debug=False):
        super().__init__(config, debug=debug)
        self.white_bg = config.getboolean('white_bg')
        self.normal_smooth_weight = config.getfloat(
            'normal_smooth_weight', fallback=0.0)
        self.lvis_smooth_weight = config.getfloat(
            'lvis_smooth_weight', fallback=0.0)
        self.normal_loss_weight = config.getfloat(
            'normal_loss_weight', fallback=1.0)
        self.lvis_loss_weight = config.getfloat(
            'lvis_loss_weight', fallback=1.0)
        self.smooth_use_l1 = config.getboolean('smooth_use_l1',
                                               fallback=False)
        self.xyz_jitter_std = config.getfloat('xyz_jitter_std', fallback=0.0)
        self.xyz_scale = config.getfloat('xyz_scale', fallback=1.0)
        # The joint model sets this False when shape_mode='frozen': the
        # normal/lvis chains then skip all dW/db work in their fused
        # backward (their weights get zero updates via trainable_mask
        # anyway)
        self.shape_heads_need_dw = True
        self.pos_enc = config.getboolean('pos_enc')
        self.n_freqs_xyz = config.getint('n_freqs_xyz')
        self.n_freqs_ldir = config.getint('n_freqs_ldir')
        self.n_freqs_vdir = config.getint('n_freqs_vdir')
        self.mlp_width = config.getint('mlp_width')
        self.mlp_depth = config.getint('mlp_depth')
        self.mlp_skip_at = config.getint('mlp_skip_at')
        # Light sphere (or MVS-provided light locations)
        lxyz, lareas = self._gen_lights()
        self.lxyz = jnp.asarray(lxyz, jnp.float32)
        self.lareas = jnp.asarray(lareas, jnp.float32)
        self.n_lights = int(np.prod(lxyz.shape[:-1]))
        # Eval ray chunk for the N x L blow-up
        mlp_chunk = config.getint('mlp_chunk', fallback=1048576)
        self.eval_ray_chunk = max(64, mlp_chunk // max(self.n_lights, 1))
        # Fused Pallas embed->MLP->head chains (ops/pallas_mlp.py):
        # transposed (features, rows) boundaries + recompute backward.
        # Default True in every shipped shape/joint config — measured
        # on v5e this is the difference between ~24.6 ms (XLA + bf16
        # chains) and ~10 ms per joint step at 1024 rays x 512 lights.
        # The INI fallback stays False so bare configs (and CPU tests)
        # get the portable XLA path unless they opt in.
        self.fused_mlp = config.getboolean('fused_mlp', fallback=False)
        # bf16 activations for the (rays x lights)-scale chains: the
        # joint step is HBM-bound (CLAUDE.md perf notes), and these
        # chains' saved activations dominate the traffic. Matmuls still
        # accumulate f32; the N-scale heads (normal/albedo/brdf_z) and
        # the render stay f32.
        self.big_chain_dtype = jnp.bfloat16 if config.getboolean(
            'bf16_big_chains', fallback=False) else None
        # Per-chain opt-out: '+'-separated chain names ('lvis', 'brdf')
        # that stay f32 even under bf16_big_chains ('+' because
        # --config_override reserves ','). Lets quality-sensitive runs
        # keep one chain exact while the other rides bf16 (the
        # fixed-optimizer regime exposed a ~0.5 dB bf16 cost on the XLA
        # path; see QUALITY.md "Optimizer parity").
        self.f32_chains = frozenset(
            s for s in config.get('f32_chains', fallback='').replace(
                '+', ' ').split() if s)
        self._init_specs()
        self._init_plans()

    def _gen_lights(self):
        mvs_root = self.config.get('mvs_root', fallback=None)
        if mvs_root is None:
            light_h = self.config.getint('light_h')
            lxyz, lareas = gen_light_xyz(light_h, 2 * light_h)
        else:
            data = ioutil.load_np(join(mvs_root, 'lights.npz'))
            lxyz, lareas = data['lxyzs'], data['lareas']
        return lxyz, lareas

    def _xyz_dims(self):
        return encoding.embed_dims(3, self.n_freqs_xyz) if self.pos_enc \
            else 3

    def _ldir_dims(self):
        return encoding.embed_dims(3, self.n_freqs_ldir) if self.pos_enc \
            else 3

    def _init_specs(self):
        w, d, s = self.mlp_width, self.mlp_depth, self.mlp_skip_at
        self.specs = {
            'normal_mlp': networks.MLPSpec(
                self._xyz_dims(), [w] * d, acts='relu', skip_at=[s]),
            'lvis_mlp': networks.MLPSpec(
                self._xyz_dims() + self._ldir_dims(), [w] * d, acts='relu',
                skip_at=[s]),
        }
        self.specs['normal_out'] = networks.MLPSpec(
            self.specs['normal_mlp'].out_dim, [3], acts=None)
        self.specs['lvis_out'] = networks.MLPSpec(
            self.specs['lvis_mlp'].out_dim, [1], acts='sigmoid')

    def _nf(self, n_freqs):
        return n_freqs if self.pos_enc else 0

    def _init_plans(self):
        self.plans = {}
        if 'normal_mlp' in self.specs:
            self.plans['normal'] = pallas_mlp.plan_from_specs(
                [(3, self._nf(self.n_freqs_xyz))],
                self.specs['normal_mlp'], self.specs['normal_out'])
            self.plans['lvis'] = pallas_mlp.plan_from_specs(
                [(3, self._nf(self.n_freqs_xyz)),
                 (3, self._nf(self.n_freqs_ldir))],
                self.specs['lvis_mlp'], self.specs['lvis_out'])

    def chain_dtype(self, name):
        """Compute dtype for the named big chain ('lvis', 'brdf'):
        ``big_chain_dtype`` unless the chain is pinned f32 via the
        ``f32_chains`` config key."""
        return None if name in self.f32_chains else self.big_chain_dtype

    def _chain(self, params, mlp_name, out_name, plan, x_raw,
               compute_dtype=None, needs_dx=True, needs_dw=True):
        """One fused embed->MLP->head evaluation. ``needs_dx=False``
        (inputs are data, e.g. xyz/surf2l) lets the fused kernel skip
        the input-cotangent branch of its backward; ``needs_dw=False``
        (frozen weights, e.g. the joint model's BRDF prior) skips all
        dW/db accumulation."""
        p = pallas_mlp.params_from_tree(params[mlp_name],
                                        params[out_name])
        return pallas_mlp.apply_chain(
            plan, x_raw, p, force_reference=not self.fused_mlp,
            compute_dtype=compute_dtype, needs_dx=needs_dx,
            needs_dw=needs_dw)

    def init_params(self, key):
        params = {}
        for name, spec in self.specs.items():
            key, sub = jax.random.split(key)
            params[name] = spec.init(sub)
        return params

    # ------ pure compute ------

    def _embed_xyz(self, x):
        return encoding.posenc(x, self.n_freqs_xyz) if self.pos_enc else x

    def _embed_ldir(self, x):
        return encoding.posenc(x, self.n_freqs_ldir) if self.pos_enc else x

    def _embed_vdir(self, x):
        return encoding.posenc(x, self.n_freqs_vdir) if self.pos_enc else x

    def calc_ldir(self, pts):
        """(N, 3) -> (N, L, 3) unit directions surface -> light pixels."""
        lxyz_flat = self.lxyz.reshape(1, -1, 3)
        surf2l = lxyz_flat - pts[:, None, :]
        return safe_l2_normalize(surf2l, axis=2)

    @staticmethod
    def calc_vdir(cam_loc, pts):
        return safe_l2_normalize(cam_loc - pts, axis=1)

    def pred_normal_at(self, params, pts, eps=1e-6):
        pts_scaled = self.xyz_scale * pts
        normal = self._chain(params, 'normal_mlp', 'normal_out',
                             self.plans['normal'], pts_scaled,
                             needs_dx=False,
                             needs_dw=self.shape_heads_need_dw)
        # eps avoids all-zero normals producing zero tangents downstream
        return normal + eps

    def pred_lvis_at(self, params, pts, surf2l):
        """(N, 3), (N, L, 3) -> (N, L), dense fused pass."""
        n, l = surf2l.shape[0], surf2l.shape[1]
        pts_scaled = self.xyz_scale * pts
        # NOTE (measured, v5e, rounds 1-4): per-ray sharing of the xyz
        # half of this chain LOSES at every level tried. At the XLA
        # level (xyz part at N scale, broadcast over lights): joint
        # step 24.6 -> 25.9 ms -- the broadcast fragments XLA's fusion
        # by more than the saved 63-column embedding traffic. At the
        # kernel level (round 3's light-major shared-ray kernel, since
        # deleted): wins 6.7 -> 6.3 ms in isolation but loses the full
        # step 8.6 -> 8.9 ms to the light-major boundary transposes --
        # and the round-4 pass-cost model shows why it cannot win: an
        # MXU pass costs ~n/4 cycles regardless of K, so removing the
        # xyz ROWS from the ext operand removes no passes from the N*L
        # loop; the only in-kernel saving is VPU trig work, which is
        # not the binding constraint. The dense concat below is the
        # fast path at any L.
        surf_rep = jnp.broadcast_to(pts_scaled[:, None, :], (n, l, 3))
        x_raw = jnp.concatenate(
            (surf_rep.reshape(-1, 3), surf2l.reshape(-1, 3)), axis=-1)
        lvis = self._chain(params, 'lvis_mlp', 'lvis_out',
                           self.plans['lvis'], x_raw,
                           compute_dtype=self.chain_dtype('lvis'),
                           needs_dx=False,
                           needs_dw=self.shape_heads_need_dw)
        return lvis.reshape(n, l)

    def _forward_chunked(self, fn, pts, chunk):
        """lax.map over ray chunks for full-image eval."""
        n = pts.shape[0]
        if n <= chunk:
            return fn(pts)
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        if pad:
            pts = jnp.concatenate(
                [pts, jnp.repeat(pts[-1:], pad, axis=0)], axis=0)
        out = jax.lax.map(fn, pts.reshape((n_chunks, chunk) + pts.shape[1:]))
        return jax.tree_util.tree_map(
            lambda y: y.reshape((n_chunks * chunk,) + y.shape[2:])[:n], out)

    def apply(self, params, batch, mode='train', key=None):
        self._validate_mode(mode)
        alpha = batch['alpha']
        xyz, normal, lvis = batch['xyz'], batch['normal'], batch['lvis']

        def forward(pts):
            surf2l = self.calc_ldir(pts)
            return {'normal': self.pred_normal_at(params, pts),
                    'lvis': self.pred_lvis_at(params, pts, surf2l)}

        # Smoothness probes at jittered positions ride the SAME fused
        # kernel calls as the main rows (twin-merged: one 2N-row
        # dispatch per head instead of two N-row ones); heads whose
        # smoothness weight is zero skip the twin entirely
        normal_jitter, lvis_jitter = None, None
        jitter = (mode == 'train' and self.xyz_jitter_std > 0
                  and key is not None)
        jit_normal = jitter and self.normal_smooth_weight > 0
        jit_lvis = jitter and self.lvis_smooth_weight > 0
        n = xyz.shape[0]
        if mode == 'train':
            if jitter:
                noise = self.xyz_jitter_std * jax.random.normal(
                    key, xyz.shape)
                xyz_all = jnp.concatenate([xyz, xyz + noise], axis=0)
            normal_all = self.pred_normal_at(
                params, xyz_all if jit_normal else xyz)
            lvis_in = xyz_all if jit_lvis else xyz
            lvis_all = self.pred_lvis_at(
                params, lvis_in, self.calc_ldir(lvis_in))
            out = {'normal': normal_all[:n], 'lvis': lvis_all[:n]}
            if jit_normal:
                normal_jitter = safe_l2_normalize(normal_all[n:], axis=1)
            if jit_lvis:
                lvis_jitter = lvis_all[n:]
        else:
            out = self._forward_chunked(forward, xyz, self.eval_ray_chunk)
        normal_pred = safe_l2_normalize(out['normal'], axis=1)
        lvis_pred = out['lvis']
        pred = {'normal': normal_pred, 'lvis': lvis_pred}
        gt = {'normal': normal, 'lvis': lvis, 'alpha': alpha}
        loss_kwargs = {'normal_jitter': normal_jitter,
                       'lvis_jitter': lvis_jitter}
        to_vis = {'gt_alpha': alpha}
        for k, v in pred.items():
            to_vis['pred_' + k] = v
        for k in ('normal', 'lvis'):
            to_vis['gt_' + k] = gt[k]
        return pred, gt, loss_kwargs, to_vis

    def compute_loss(self, params, pred, gt, normal_jitter=None,
                     lvis_jitter=None, **kwargs):
        """Per-example loss; signals composited onto the background
        first (reference shape.py:239-277)."""
        smooth_loss = mae_lastdim if self.smooth_use_l1 else mse_lastdim
        alpha = gt['alpha']
        normal_pred, normal_gt = pred['normal'], gt['normal']
        lvis_pred, lvis_gt = pred['lvis'], gt['lvis']
        bgv = 1.0 if self.white_bg else 0.0
        normal_pred = normal_pred * alpha + bgv * (1 - alpha)
        normal_gt = normal_gt * alpha + bgv * (1 - alpha)
        lvis_pred = lvis_pred * alpha + bgv * (1 - alpha)
        lvis_gt = lvis_gt * alpha + bgv * (1 - alpha)
        loss = self.normal_loss_weight * mse_lastdim(normal_gt, normal_pred)
        loss += self.lvis_loss_weight * mse_lastdim(lvis_gt, lvis_pred)
        if normal_jitter is not None:
            jitter_blend = normal_jitter * alpha + bgv * (1 - alpha)
            loss += self.normal_smooth_weight * smooth_loss(
                normal_pred, jitter_blend)
        if lvis_jitter is not None:
            jitter_blend = lvis_jitter * alpha + bgv * (1 - alpha)
            loss += self.lvis_smooth_weight * smooth_loss(
                lvis_pred, jitter_blend)
        return loss

    # ------ host-side vis ------

    def vis_batch(self, data_dict, outdir, mode='train', dump_raw_to=None):
        self._validate_mode(mode)
        if mode == 'train':
            return
        data_dict = dict(data_dict)
        hw = tuple(int(x) for x in data_dict.pop('hw'))
        id_ = data_dict.pop('id')
        imgs = {}
        for k, v in data_dict.items():
            v = np.asarray(v)
            if k.endswith('normal'):
                imgs[k] = v.reshape(hw + (3,))
            elif k.endswith(('occu', 'alpha')):
                imgs[k] = v.reshape(hw)
            elif k.endswith('lvis'):
                imgs[k] = v.reshape(hw + (v.shape[-1],))
            else:
                raise NotImplementedError(k)
        img_dict = {}
        alpha = imgs['gt_alpha']
        for k, v in imgs.items():
            if k.endswith('normal'):
                v = (v + 1) / 2
                bg = np.ones_like(v) if self.white_bg else np.zeros_like(v)
                img_dict[k] = ioutil.write_img(
                    imgops.alpha_blend(v, alpha, bg),
                    join(outdir, k + '.png'))
            elif k.endswith('lvis'):
                v = np.mean(v, axis=2)
                bg = np.ones_like(v) if self.white_bg else np.zeros_like(v)
                img_dict[k] = ioutil.write_img(
                    imgops.alpha_blend(v, alpha, bg),
                    join(outdir, k + '.png'))
            else:
                img_dict[k] = ioutil.write_img(v, join(outdir, k + '.png'))
        if mode == 'test':
            ioutil.write_json({'id': id_}, join(outdir, 'metadata.json'))
            return
        font_color = (0, 0, 0) if self.white_bg else (1.0, 1.0, 1.0)
        def lbl(img, text):
            return visutil.put_text(img, text, color=font_color)
        visutil.make_anim(
            (lbl(img_dict['gt_normal'], "Initial"),
             lbl(img_dict['pred_normal'], "Prediction")),
            join(outdir, 'pred-vs-gt_normal.apng'))
        visutil.make_anim(
            (lbl(img_dict['gt_lvis'], "Initial"),
             lbl(img_dict['pred_lvis'], "Prediction")),
            join(outdir, 'pred-vs-gt_lvis.apng'))
        ioutil.write_json({'id': id_}, join(outdir, 'metadata.json'))

    def compile_batch_vis(self, batch_vis_dirs, outpref, mode='train'):
        self._validate_mode(mode)
        if mode == 'train':
            return None
        viewer_prefix = self.config.get('viewer_prefix', fallback='')
        assert mode == 'vali', \
            "Shape model compiles only validation batches (use the "\
            "NeRFactor model for test-time videos)"
        out_html = outpref + '.html'
        rows = []
        for batch_dir in batch_vis_dirs:
            metadata = ioutil.read_json(join(batch_dir, 'metadata.json'))
            rows.append([str(metadata),
                         join(batch_dir, 'pred-vs-gt_normal.apng'),
                         join(batch_dir, 'pred-vs-gt_lvis.apng')])
        assert rows, "No row"
        html = visutil.HTML(
            bgcolor='white' if self.white_bg else 'black',
            text_color='black' if self.white_bg else 'white')
        html.add_header("Refining and Caching Geometry Initialization")
        table = html.add_table()
        for r in rows:
            table.add_row(r, ['text', 'image', 'image'],
                          captions=["Metadata", "Normal",
                                    "Light Visibility"])
        html.save(out_html)
        return viewer_prefix + out_html
