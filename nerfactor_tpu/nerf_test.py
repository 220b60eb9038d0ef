"""NeRF test-trajectory rendering + video.

CLI parity with the reference's nerf_test.py:
  python -m nerfactor_tpu.nerf_test --ckpt=/path/to/ckpt-20
"""

import argparse
from os.path import join, basename

import jax
import numpy as np

from nerfactor_tpu import datasets, models
from nerfactor_tpu.utils import config as configutil, io as ioutil
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="nerf_test")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--ckpt', required=True,
                   help="path to checkpoint (prefix only)")
    p.add_argument('--debug', action='store_true')
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    config_ini = configutil.get_config_ini(args.ckpt)
    config = configutil.Config(configutil.read_config(config_ini))
    outroot = join(config_ini[:-4], 'vis_test', basename(args.ckpt))

    logger.info("Making the data pipeline")
    Dataset = datasets.get_dataset_class(config.get('dataset'))
    dataset = Dataset(config, 'test', debug=args.debug)
    n_views = dataset.get_n_views()
    datapipe = dataset.build_pipeline(no_shuffle=True)

    logger.info("Restoring trained model")
    Model = models.get_model_class(config.get('model'))
    model = Model(config, debug=args.debug)
    from nerfactor_tpu.explore_brdf_space import restore_model
    params = restore_model(model, args.ckpt)

    eval_fn = jax.jit(
        lambda p, arrays, key: model.apply(p, arrays, mode='test',
                                           key=key)[3])

    from nerfactor_tpu.trainvali import split_batch
    key = jax.random.PRNGKey(0)
    logger.info("Running inference over %d views", n_views)
    for batch_i, batch in enumerate(datapipe):
        meta, arrays = split_batch(dataset, batch)
        key, sub = jax.random.split(key)
        to_vis = eval_fn(params, arrays, sub)
        to_vis_np = {k: np.asarray(v) for k, v in to_vis.items()}
        to_vis_np.update(meta)
        outdir = join(outroot, 'batch{i:09d}'.format(i=batch_i))
        model.vis_batch(to_vis_np, outdir, mode='test')
        if args.debug:
            break

    batch_vis_dirs = ioutil.sortglob(outroot, 'batch?????????')
    view_at = model.compile_batch_vis(batch_vis_dirs, outroot, mode='test')
    logger.info("Compilation available for viewing at\n\t%s", view_at)


if __name__ == '__main__':
    main()
