"""Imports a REFERENCE (TF) NeRF checkpoint into this framework's npz
format, so our geometry_from_nerf can distill from the exact same
trained NeRF the reference distilled from -- isolating distillation
differences from NeRF-training differences in the from-NeRF
cross-validation (PARITY.md round 3).

The reference stores Keras Dense stacks as
`net/net_{level}_{comp}_layer{i}/{kernel,bias}` with (in, out) kernels
and `[y, x]` skip concatenation -- bit-compatible layout with our
functional pytrees (models/networks.py:init_mlp), so the import is a
pure name mapping.

    python -m tools.import_ref_nerf \
      --ref_ckpt /tmp/ref_fromnerf/out/nerf/lr5e-4/checkpoints/ckpt-1 \
      --data_root /tmp/ref_fromnerf/data --imh 32 --mlp_width 64 \
      --out /tmp/ref_nerf_as_ours/lr5e-4
"""

import argparse
import os
from os.path import join


def load_ref_nerf_arrays(ref_ckpt):
    """Reads the TF checkpoint into {our_key: [{'w','b'}...]}."""
    from tensorflow.python.training import py_checkpoint_reader
    rd = py_checkpoint_reader.NewCheckpointReader(ref_ckpt)
    shapes = rd.get_variable_to_shape_map()

    def tensor(name):
        return rd.get_tensor(
            'net/net_%s/.ATTRIBUTES/VARIABLE_VALUE' % name)

    def n_layers(level, comp):
        i = 0
        while ('net/net_%s_%s_layer%d/kernel/.ATTRIBUTES/VARIABLE_VALUE'
               % (level, comp, i)) in shapes:
            i += 1
        return i

    params = {}
    for level in ('coarse', 'fine'):
        for comp in ('enc', 'sigma_out', 'bottleneck', 'rgb_out'):
            n = n_layers(level, comp)
            assert n > 0, 'no layers found for %s_%s' % (level, comp)
            params['%s_%s' % (level, comp)] = [
                {'w': tensor('%s_%s_layer%d/kernel' % (level, comp, i)),
                 'b': tensor('%s_%s_layer%d/bias' % (level, comp, i))}
                for i in range(n)]
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ref_ckpt', required=True,
                    help="reference ckpt prefix (TF format)")
    ap.add_argument('--data_root', required=True)
    ap.add_argument('--out', required=True,
                    help="output experiment dir (e.g. .../nerf/lr5e-4)")
    ap.add_argument('--imh', type=int, default=32)
    ap.add_argument('--mlp_width', type=int, default=64)
    ap.add_argument('--epoch', type=int, default=600,
                    help="epoch number to stamp on the imported ckpt")
    ap.add_argument('--extra_override', default='')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')  # conversion is host-side
    import jax.numpy as jnp
    import numpy as np
    from nerfactor_tpu.models import get_model_class
    from nerfactor_tpu.parallel.train import build_optimizer
    from nerfactor_tpu.utils import ckpt as ckptutil, config as configutil

    parser = configutil.read_config(
        configutil.resolve_config_path('nerf.ini'))
    overrides = ','.join([
        'data_root=%s' % args.data_root,
        'outroot=%s' % os.path.dirname(args.out),
        'imh=%d' % args.imh, 'near=2', 'far=6',
        'n_samples_coarse=32', 'n_samples_fine=64',
        'mlp_width=%d' % args.mlp_width,
        'mlp_chunk=65536', 'lr=5e-4'])
    if args.extra_override:
        overrides += ',' + args.extra_override
    configutil.apply_override(parser, overrides)
    configutil.write_config(parser, args.out + '.ini')
    config = configutil.Config(parser)
    model = get_model_class('nerf')(config)

    template = model.init_params(jax.random.PRNGKey(0))
    imported = load_ref_nerf_arrays(args.ref_ckpt)
    assert set(imported) == set(template), (
        sorted(imported), sorted(template))
    params = {}
    for key, layers in template.items():
        assert len(layers) == len(imported[key]), key
        params[key] = []
        for ours, theirs in zip(layers, imported[key]):
            assert tuple(ours['w'].shape) == tuple(theirs['w'].shape), (
                key, ours['w'].shape, theirs['w'].shape)
            params[key].append(
                {'w': jnp.asarray(theirs['w'], jnp.float32),
                 'b': jnp.asarray(theirs['b'], jnp.float32)})
    opt_state = build_optimizer(config).init(params)
    path = join(args.out, 'checkpoints', 'ckpt-%d' % args.epoch)
    ckptutil.save_pytree({'params': params, 'opt_state': opt_state}, path)
    n = sum(np.asarray(l).size for l in jax.tree_util.tree_leaves(params))
    print('imported %d params -> %s' % (n, path))


if __name__ == '__main__':
    main()
