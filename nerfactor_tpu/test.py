"""NeRFactor inference: simultaneous relighting and view synthesis, plus
albedo color-correction and albedo/BRDF material edits.

CLI parity with the reference's test.py:
  python -m nerfactor_tpu.test --ckpt=/path/to/ckpt-10 \
      [--color_correct_albedo] [--tgt_albedo=gold] [--tgt_brdf=pearl-paint]
      [--sv_axis_i=0 --sv_axis_min=-1.5 --sv_axis_max=1.5] [--debug]

The config is discovered from the checkpoint path by convention
(<outroot>/<xname>/checkpoints/ckpt-N -> <outroot>/<xname>.ini).
"""

import argparse
from os.path import join, basename

import jax
import numpy as np

from nerfactor_tpu import datasets, models
from nerfactor_tpu.parallel.train import upcast_batch
from nerfactor_tpu.utils import config as configutil, io as ioutil
from nerfactor_tpu.utils import ckpt as ckptutil
from nerfactor_tpu.utils.logging import Logger
from nerfactor_tpu.ops import img as imgops

logger = Logger(loggee="test")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--ckpt', required=True,
                   help="path to checkpoint (prefix only)")
    p.add_argument('--color_correct_albedo', action='store_true')
    p.add_argument('--sv_axis_i', type=int, default=0,
                   help="along which axis we do spatially-varying edits")
    p.add_argument('--sv_axis_min', type=float, default=-1.5)
    p.add_argument('--sv_axis_max', type=float, default=1.5)
    p.add_argument('--tgt_albedo', default=None, help="albedo edit name")
    p.add_argument('--tgt_brdf', default=None, help="BRDF edit name")
    p.add_argument('--debug', action='store_true')
    return p.parse_args(argv)


def compute_rgb_scales(ckpt_path, alpha_thres=0.9):
    """Per-channel least-squares scales matching predicted albedo to the
    ground truth of the first validation view (reference test.py:46-88)."""
    config_ini = configutil.get_config_ini(ckpt_path)
    config = configutil.Config(configutil.read_config(config_ini))
    vali_dir = join(config_ini[:-len('.ini')], 'vis_vali')
    data_root = config.get('data_root')
    epoch_dirs = ioutil.sortglob(vali_dir, 'epoch?????????')
    assert epoch_dirs, "No validation epochs to color-correct against"
    batch_dirs = ioutil.sortglob(epoch_dirs[-1], 'batch?????????')
    metadata = ioutil.read_json(join(batch_dirs[0], 'metadata.json'))
    view = metadata['id']
    pred = ioutil.load_img(join(batch_dirs[0], 'pred_albedo.png'))
    gt = ioutil.load_img(join(data_root, view, 'albedo.png'),
                         force_rgba=True)
    pred = pred[:, :, :3] ** 2.2  # undo gamma
    gt = imgops.resize(gt, new_h=pred.shape[0])
    alpha = gt[:, :, 3]
    gt = gt[:, :, :3]
    is_fg = alpha > alpha_thres
    opt_scale = []
    for i in range(3):
        x_hat = pred[:, :, i][is_fg]
        x = gt[:, :, i][is_fg]
        opt_scale.append(x_hat.dot(x) / x_hat.dot(x_hat))
    return np.asarray(opt_scale, np.float32)


ALBEDO_EDITS = ('aluminium', 'gold', 'green', 'rainbow', 'turbo')


def get_albedo_override(args, xyz):
    """Solid-color or spatially-varying albedo edits
    (reference test.py:91-132). ``xyz`` is the (N, 3) surface buffer."""
    solid = {'aluminium': (0.913, 0.921, 0.925), 'gold': (1.0, 0.843, 0.0),
             'green': (0.0, 1.0, 0.0)}
    if args.tgt_albedo in solid:
        return np.asarray(solid[args.tgt_albedo], np.float32).reshape(1, 3)
    axis = np.asarray(xyz)[:, args.sv_axis_i]
    if args.tgt_albedo == 'rainbow':
        rainbow = np.asarray([
            (0.58, 0, 0.83), (0.29, 0, 0.51), (0, 0, 1), (0, 1, 0),
            (1, 1, 0), (1, 0.5, 0), (1, 0, 0)], np.float32)
        band_width = (args.sv_axis_max - args.sv_axis_min) / len(rainbow)
        band = np.floor((axis - args.sv_axis_min) / band_width).astype(int)
        band = np.clip(band, 0, len(rainbow) - 1)
        out = rainbow[band]
        # Out-of-range points keep zero albedo, matching the reference's
        # scatter-only-in-band behavior
        in_range = (axis >= args.sv_axis_min) & (axis < args.sv_axis_max)
        out[~in_range] = 0.0
        return out.astype(np.float32)
    if args.tgt_albedo == 'turbo':
        from matplotlib import cm
        x = (axis - args.sv_axis_min) / (
            args.sv_axis_max - args.sv_axis_min)
        return cm.get_cmap('turbo')(np.clip(x, 0, 1))[:, :3].astype(
            np.float32)
    raise NotImplementedError("Target albedo: %s" % args.tgt_albedo)


def main(argv=None):
    args = parse_args(argv)
    if args.debug:
        logger.warn("Debug mode: on")

    if args.tgt_albedo and args.tgt_albedo not in ALBEDO_EDITS:
        raise SystemExit(
            "Unknown --tgt_albedo '%s'; choose one of %s"
            % (args.tgt_albedo, ', '.join(ALBEDO_EDITS)))

    config_ini = configutil.get_config_ini(args.ckpt)
    config = configutil.Config(configutil.read_config(config_ini))

    outroot = join(config_ini[:-len('.ini')], 'vis_test',
                   basename(args.ckpt))
    if args.tgt_albedo:
        outroot += '_%s' % args.tgt_albedo
    if args.tgt_brdf:
        outroot += '_%s' % args.tgt_brdf

    # Dataset: test trajectory (spiral cams, placeholder RGB)
    Dataset = datasets.get_dataset_class(config.get('dataset'))
    dataset = Dataset(config, 'test', debug=args.debug)
    n_views = dataset.get_n_views()
    datapipe = dataset.build_pipeline(no_shuffle=True)

    # Model + restored params
    Model = models.get_model_class(config.get('model'))
    model = Model(config, debug=args.debug)
    params = model.init_params(jax.random.PRNGKey(0))
    params = ckptutil.restore_trained_params(args.ckpt, params, config)

    # Optional albedo color-correction
    albedo_scales = None
    if (not args.tgt_albedo) and args.color_correct_albedo:
        albedo_scales = compute_rgb_scales(args.ckpt)
        logger.info("Albedo scales: %s", albedo_scales)

    # Optional BRDF edit: named MERL material's latent code
    brdf_z_override = None
    if args.tgt_brdf:
        from nerfactor_tpu.models.brdf import Model as BRDFModel
        brdf_model = BRDFModel(model.config_brdf)
        ind = brdf_model.brdf_names.index(args.tgt_brdf)
        brdf_z_override = np.asarray(
            params['latent_code'][ind, :], np.float32)

    def make_step(relight_olat):
        def f(p, arrays, albedo_override):
            arrays = upcast_batch(arrays)
            _, _, _, to_vis = model.apply(
                p, arrays, mode='test', relight_olat=relight_olat,
                relight_probes=True, albedo_scales=albedo_scales,
                albedo_override=albedo_override,
                brdf_z_override=brdf_z_override)
            return to_vis
        return jax.jit(f)

    step = make_step(False)
    step_olat = make_step(True)

    logger.info("Running inference on %d views", n_views)
    key = jax.random.PRNGKey(0)
    del key  # inference is deterministic
    for batch_i, batch in enumerate(datapipe):
        relight_olat = batch_i == n_views - 1  # only for the final view
        meta = {k: v for k, v in batch.items()
                if k not in dataset.array_keys}
        arrays = {k: np.asarray(batch[k]) for k in dataset.array_keys}
        albedo_override = None
        if args.tgt_albedo:
            albedo_override = get_albedo_override(args, arrays['xyz'])
        fn = step_olat if relight_olat else step
        to_vis = fn(params, arrays, albedo_override)
        to_vis_np = {k: np.asarray(v) for k, v in to_vis.items()}
        to_vis_np.update(meta)
        outdir = join(outroot, 'batch{i:09d}'.format(i=batch_i))
        model.vis_batch(to_vis_np, outdir, mode='test',
                        olat_vis=relight_olat)
        if args.debug:
            break

    batch_vis_dirs = ioutil.sortglob(outroot, 'batch?????????')
    view_at = model.compile_batch_vis(batch_vis_dirs, outroot, mode='test')
    logger.info("Compilation available for viewing at\n\t%s", view_at)


if __name__ == '__main__':
    main()
