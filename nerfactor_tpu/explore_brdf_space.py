"""BRDF prior testing: reconstructions of seen materials + latent-space
interpolation video.

CLI parity with the reference's explore_brdf_space.py:
  python -m nerfactor_tpu.explore_brdf_space --ckpt=/path/to/ckpt-50
"""

import argparse
from os.path import join, basename, exists

import jax
import jax.numpy as jnp
import numpy as np

from nerfactor_tpu import datasets, models
from nerfactor_tpu.utils import config as configutil, io as ioutil
from nerfactor_tpu.utils import ckpt as ckptutil
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="explore_brdf_space")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--ckpt', required=True,
                   help="path to checkpoint (prefix only, e.g. .../ckpt-50)")
    p.add_argument('--debug', action='store_true')
    return p.parse_args(argv)


def restore_model(model, ckpt_path):
    """Restores a model's trainable params from a ckpt-N prefix (the
    checkpoint stores {'params', 'opt_state'}; inference needs only
    the params tail -- same path as test.py)."""
    template = model.init_params(jax.random.PRNGKey(0))
    return ckptutil.restore_trained_params(ckpt_path, template,
                                           model.config)


def main(argv=None):
    args = parse_args(argv)
    config_ini = configutil.get_config_ini(args.ckpt)
    config = configutil.Config(configutil.read_config(config_ini))

    outroot = join(config_ini[:-4], 'vis_test', basename(args.ckpt))

    logger.info("Making the data pipeline")
    Dataset = datasets.get_dataset_class(config.get('dataset'))
    dataset = Dataset(config, 'test', debug=args.debug)
    n_brdfs = dataset.get_n_brdfs()
    datapipe = dataset.build_pipeline(no_shuffle=True)

    logger.info("Restoring trained model")
    Model = models.get_model_class(config.get('model'))
    model = Model(config, debug=args.debug)
    params = restore_model(model, args.ckpt)

    eval_fn = jax.jit(
        lambda p, arrays, z: model.apply(p, arrays, mode='test',
                                         z_override=z)[3])

    logger.info("Running inference over %d identities", n_brdfs)
    from nerfactor_tpu.trainvali import split_batch
    for batch_i, batch in enumerate(datapipe):
        outdir = join(outroot, f'batch{batch_i:09d}')
        expects = [join(outdir, x) for x in (
            'cslice.png', 'log10_brdf.png', 'metadata.json', 'render.png',
            'z.png')]
        if all(exists(x) for x in expects):
            continue
        meta, arrays = split_batch(dataset, batch)
        id_ = meta['id']
        if '_' in id_ and int(arrays['i']) == -1:
            # Interpolated identity: '<i>_<w1>_<mat1>_<w2>_<mat2>'
            _, w1, mat1, w2, mat2 = id_.split('_')
            i1 = model.brdf_names.index(mat1)
            i2 = model.brdf_names.index(mat2)
            z = model.interp_z(params, float(w1), i1, float(w2), i2)
        else:
            z = model.lookup_z(params, jnp.asarray([int(arrays['i'])]))
        to_vis = eval_fn(params, arrays, z)
        to_vis_np = {k: np.asarray(v) for k, v in to_vis.items()}
        to_vis_np.update(meta)
        model.vis_batch(to_vis_np, outdir, mode='test')
        if args.debug and batch_i > 2:
            break

    batch_vis_dirs = ioutil.sortglob(outroot, 'batch?????????')
    view_at = model.compile_batch_vis(batch_vis_dirs, outroot, mode='test')
    logger.info("Compilation available for viewing at\n\t%s", view_at)


if __name__ == '__main__':
    main()
