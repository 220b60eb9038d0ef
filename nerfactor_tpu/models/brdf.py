"""Learned latent-code BRDF prior over the MERL database.

Reference behavior: nerfactor/models/brdf.py. A GLO latent table assigns
each MERL material a z; an MLP maps z (+) posenc(rusink) -> softplus
reflectance. Training enforces Helmholtz reciprocity by also evaluating
the (phi_d + pi) twin against the same target, and the loss operates on
log-/divide-transformed reflectance.

TPU-first notes: the whole (B, z+embed) -> MLP evaluation is one fused
matmul chain (no mlp_chunk loops); reciprocity doubles the batch instead
of a second pass.
"""

from os.path import join, basename, exists

import jax
import jax.numpy as jnp
import numpy as np

from nerfactor_tpu.models.base import BaseModel
from nerfactor_tpu.models import networks
from nerfactor_tpu.ops import encoding
from nerfactor_tpu.utils import io as ioutil, vis as visutil
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="models/brdf")


class Model(BaseModel):
    def __init__(self, config, debug=False):
        super().__init__(config, debug=debug)
        self.n_freqs = config.getint('n_freqs')
        self.pos_enc = config.getboolean('pos_enc')
        self.z_dim = config.getint('z_dim')
        self.z_gauss_mean = config.getfloat('z_gauss_mean')
        self.z_gauss_std = config.getfloat('z_gauss_std')
        self.normalize_z = config.getboolean('normalize_z')
        mlp_width = config.getint('mlp_width')
        mlp_depth = config.getint('mlp_depth')
        mlp_skip_at = config.getint('mlp_skip_at')
        rusink_dims = encoding.embed_dims(3, self.n_freqs) if self.pos_enc \
            else 3
        in_dim = self.z_dim + rusink_dims
        self.mlp_spec = networks.MLPSpec(
            in_dim, [mlp_width] * mlp_depth, acts='relu',
            skip_at=[mlp_skip_at])
        self.out_spec = networks.MLPSpec(
            self.mlp_spec.out_dim, [1], acts='softplus')
        # BRDF identities from the data dir
        data_dir = config.get('data_root')
        train_npz = ioutil.sortglob(data_dir, 'train_*.npz')
        self.brdf_names = [
            basename(x)[len('train_'):-len('.npz')] for x in train_npz]
        self.loss_transform = config.get('loss_transform', fallback='log')

    # ------ params ------

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            'brdf_mlp': self.mlp_spec.init(k1),
            'brdf_out': self.out_spec.init(k2),
            'latent_code': networks.init_latent_code(
                k3, max(len(self.brdf_names), 1), self.z_dim,
                mean=self.z_gauss_mean, std=self.z_gauss_std),
        }

    # ------ pure compute ------

    def _embed_rusink(self, rusink):
        if self.pos_enc:
            return encoding.posenc(rusink, self.n_freqs)
        return rusink

    def eval_brdf(self, params, z, rusink):
        """(N, z_dim) x (N, 3) -> (N, 1) reflectance."""
        z_rusink = jnp.concatenate(
            (z, self._embed_rusink(rusink)), axis=-1)
        feat = self.mlp_spec.apply(params['brdf_mlp'], z_rusink)
        return self.out_spec.apply(params['brdf_out'], feat)

    def lookup_z(self, params, i):
        """Latent code(s) for identity index array ``i``."""
        return networks.latent_code_lookup(
            params['latent_code'], i, normalize=self.normalize_z)

    def interp_z(self, params, w1, i1, w2, i2):
        return networks.latent_code_interp(
            params['latent_code'], w1, i1, w2, i2,
            normalize=self.normalize_z)

    def apply(self, params, batch, mode='train', key=None, z_override=None):
        """``batch`` carries 'rusink' (B, 3), 'refl' (B, 1) and 'i' scalar.
        Test-time identity interpolation is driven from the host via
        ``z_override`` (B|1, z_dim)."""
        self._validate_mode(mode)
        rusink = batch['rusink']
        refl = batch['refl']
        n = rusink.shape[0]
        if z_override is not None:
            z = jnp.broadcast_to(z_override, (n, self.z_dim))
        else:
            i = jnp.broadcast_to(jnp.asarray(batch['i']), (n,))
            z = self.lookup_z(params, i)
        # Reciprocity twin shares the MLP pass: stack along batch.
        phid = rusink[:, :1]
        thetah_thetad = rusink[:, 1:]
        rusink_reci = jnp.concatenate((phid + jnp.pi, thetah_thetad), axis=1)
        both = self.eval_brdf(
            params,
            jnp.concatenate((z, z), axis=0),
            jnp.concatenate((rusink, rusink_reci), axis=0))
        brdf, brdf_reci = both[:n], both[n:]
        pred = {'brdf': brdf, 'brdf_reci': brdf_reci}
        gt = {'brdf': refl}
        loss_kwargs = {}
        to_vis = {'z': z, 'brdf': brdf, 'brdf_reci': brdf_reci,
                  'gt_brdf': refl}
        return pred, gt, loss_kwargs, to_vis

    def _transform(self, x):
        if self.loss_transform.lower() == 'none':
            return x
        if self.loss_transform == 'log':
            return jnp.log(jnp.maximum(x, 1e-12))
        if self.loss_transform == 'divide':
            return x / (x + 1.0)
        raise NotImplementedError(self.loss_transform)

    def compute_loss(self, params, pred, gt, **kwargs):
        f = self._transform
        loss = 0.0
        for weight, loss_func in self.wloss:
            loss = loss + weight * loss_func(
                f(gt['brdf']), f(pred['brdf']), keep_batch=True)
            loss = loss + weight * loss_func(
                f(gt['brdf']), f(pred['brdf_reci']), keep_batch=True)
        return loss

    # ------ host-side vis ------

    def vis_batch(self, data_dict, outdir, mode='train', dump_raw_to=None,
                  n_vis=64):
        self._validate_mode(mode)
        if mode == 'train':
            return
        id_ = data_dict['id']
        ioutil.write_json({'id': id_}, join(outdir, 'metadata.json'))
        z = np.asarray(data_dict['z'])[0]
        visutil.bar_chart(z, join(outdir, 'z.png'))
        pred = np.asarray(data_dict['brdf'])
        pred_reci = np.asarray(data_dict['brdf_reci'])
        brdf_val = np.hstack((pred_reci, pred))
        if mode == 'vali':
            brdf_val = np.hstack((brdf_val, np.asarray(data_dict['gt_brdf'])))
        step = max(1, int(brdf_val.shape[0] / n_vis))
        brdf_val = brdf_val[::step, :]
        brdf_val = np.log10(np.maximum(brdf_val, 1e-12))
        visutil.bar_chart(brdf_val.T, join(outdir, 'log10_brdf.png'))
        if mode == 'vali':
            return
        # Test: characteristic slice + sphere render
        from brdf_tpu.merl import MERL
        from brdf_tpu.renderer import SphereRenderer
        merl = MERL()
        renderer = SphereRenderer(
            'point', outdir, envmap_h=int(data_dict['envmap_h']),
            envmap_inten=40, ims=int(data_dict['ims']),
            spp=int(data_dict['spp']))
        cslice_shape = merl.cube_rusink.shape[1:]
        cslice_end_i = int(np.prod(cslice_shape[:2]))
        n_render = int(renderer.lvis.astype(bool).sum())
        if pred.shape[0] != cslice_end_i + n_render:
            # Test set does not follow the reference's
            # [characteristic-slice rows | sphere-render rows] layout
            # (merl/make_dataset.py:54-69 there) -- e.g. a synthetic
            # rusink grid. The bar charts above still apply; skip the
            # slice/render images instead of crashing on the reshape.
            logger.warn(
                "Test rusink rows (%d) != cslice+render layout (%d+%d);"
                " skipping slice/render visualization",
                pred.shape[0], cslice_end_i, n_render)
            return
        pred_cslice = pred[:cslice_end_i, :]
        cslice = pred_cslice.reshape(cslice_shape[:2])
        cslice_img = merl.characteristic_slice_as_img(cslice)
        ioutil.write_img(cslice_img, join(outdir, 'cslice.png'))
        pred_render = pred[cslice_end_i:, :]
        brdf_map = np.zeros_like(renderer.lcontrib)
        brdf_map[renderer.lvis.astype(bool)] = pred_render
        render = renderer.render(brdf_map)
        ioutil.write_img(np.clip(render, 0, 1), join(outdir, 'render.png'))

    def compile_batch_vis(self, batch_vis_dirs, outpref, mode='train',
                          fps=2, marker_size=16):
        self._validate_mode(mode)
        if mode == 'train':
            return None
        viewer_prefix = self.config.get('viewer_prefix', fallback='')
        rows, caps, types = [], [], []
        for batch_dir in batch_vis_dirs:
            metadata_path = join(batch_dir, 'metadata.json')
            metadata = ioutil.read_json(metadata_path)
            id_ = metadata['id']
            row = [str(metadata), join(batch_dir, 'z.png'),
                   join(batch_dir, 'log10_brdf.png')]
            rowcaps = ["Metadata", "Latent Code", "BRDF (log-scale)"]
            rowtypes = ['text', 'image', 'image']
            if mode == 'test':
                # Absent when the test set lacks the cslice+render
                # layout (see vis_batch)
                for png, cap in ((join(batch_dir, 'cslice.png'),
                                  "Pred. (char. slice)"),
                                 (join(batch_dir, 'render.png'),
                                  "Pred. (render)")):
                    if exists(png):
                        row.append(png)
                        rowcaps.append(cap)
                        rowtypes.append('image')
            rows.append(row)
            caps.append(rowcaps)
            types.append(rowtypes)
        assert rows, "No row"
        html = visutil.HTML()
        html.add_header("BRDF-MLP")
        table = html.add_table()
        for r, rcaps, rtypes in zip(rows, caps, types):
            table.add_row(r, rtypes, captions=rcaps)
        out_html = outpref + '.html'
        html.save(out_html)
        view_at = viewer_prefix + out_html
        if mode == 'vali':
            return view_at
        # Interpolation video between seen identities
        frame_ind, frames = [], []
        for batch_dir in batch_vis_dirs:
            metadata = ioutil.read_json(join(batch_dir, 'metadata.json'))
            id_ = metadata['id']
            if '_' not in id_:
                continue
            i = int(id_.split('_')[0])
            render_path = join(batch_dir, 'render.png')
            try:
                frame = ioutil.load_img(render_path)
            except FileNotFoundError:
                continue
            frames.append((frame * 255).astype(np.uint8)
                          if frame.dtype != np.uint8 else frame)
            frame_ind.append(i)
        if frames:
            frames_sorted = [f for _, f in sorted(
                zip(frame_ind, frames), key=lambda p: p[0])]
            outvid = outpref + '.mp4'
            visutil.make_video(frames_sorted, outvid, fps=fps)
            view_at += '\n\t%s' % (viewer_prefix + outvid)
        return view_at
