"""Geometry distillation on the synthetic sphere: train a tiny NeRF, then
distill alpha/xyz/normal/lvis buffers and sanity-check them against the
analytic sphere."""

from os.path import join, exists

import numpy as np
import pytest

from tests import synth
from nerfactor_tpu.utils import io as ioutil


@pytest.fixture(scope='module')
def tiny_nerf(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('geom_data'))
    outroot = str(tmp_path_factory.mktemp('geom_out'))
    synth.make_scene(root, n_train=6, n_vali=1, n_test=1, imh=16)
    from nerfactor_tpu import trainvali
    override = ','.join([
        'data_root=%s' % root, 'outroot=%s' % outroot,
        'imh=16', 'near=2', 'far=6',
        'epochs=60', 'ckpt_period=30', 'vali_period=1000', 'vali_batches=1',
        'n_rays_per_step=256', 'n_samples_coarse=32', 'n_samples_fine=32',
        'mlp_width=64', 'enc_depth=4', 'mlp_chunk=8192',
        'lr=5e-3',
    ])
    trainvali.main(['--config', 'nerf.ini', '--config_override', override])
    return root, join(outroot, 'lr5e-3')


def test_distillation(tiny_nerf, tmp_path):
    data_root, trained = tiny_nerf
    out_root = str(tmp_path / 'surf')
    from nerfactor_tpu import geometry_from_nerf
    geometry_from_nerf.main([
        '--trained_nerf', trained,
        '--out_root', out_root,
        '--light_h', '4',
        '--lvis_far', '2',
        '--mlp_chunk', '16384',
        '--occu_thres', '0.5',
        '--debug',  # one view per mode
    ])
    view_dir = join(out_root, 'train_000')
    for f in ('alpha.png', 'xyz.npy', 'xyz.png', 'normal.npy',
              'normal.png', 'lvis.npy', 'lvis.png'):
        assert exists(join(view_dir, f)), "Missing %s" % f
    alpha = ioutil.load_img(join(view_dir, 'alpha.png'))
    xyz = ioutil.load_np(join(view_dir, 'xyz.npy'))
    normal = ioutil.load_np(join(view_dir, 'normal.npy'))
    lvis = ioutil.load_np(join(view_dir, 'lvis.npy'))
    assert xyz.shape == (16, 16, 3)
    assert normal.shape == (16, 16, 3)
    assert lvis.shape == (16, 16, 32)  # 4 x 8 lights
    # The NeRF is weak after 60 tiny epochs, but geometry should be sane:
    # some foreground detected, normals unit-length, lvis in [0, 1]
    assert (alpha > 0.5).sum() > 5, "No foreground distilled"
    norms = np.linalg.norm(normal, axis=2)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    assert lvis.min() >= 0.0 and lvis.max() <= 1.0
    fg = alpha > 0.5
    if fg.sum() > 0:
        # Foreground surface points should be near the analytic sphere
        r = np.linalg.norm(xyz[fg], axis=1)
        assert np.median(np.abs(r - synth.SPHERE_R)) < 0.4, \
            "Distilled surface far from the true sphere: median r=%.3f" \
            % np.median(r)


@pytest.mark.slow
def test_view_sharding(tiny_nerf, tmp_path):
    """--view_shard i/n run as TWO CONCURRENT PROCESSES (the real
    multi-host fan-out of the embarrassingly parallel distillation,
    reference nerfactor/README.md:122-125 ships it sequential):
    the shards partition the views disjointly and exhaustively, and
    their buffers equal an unsharded run's bit for bit."""
    import os
    import subprocess
    import sys
    data_root, trained = tiny_nerf
    from nerfactor_tpu import geometry_from_nerf
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    common = ['--trained_nerf', trained, '--light_h', '2',
              '--lvis_far', '2', '--mlp_chunk', '16384',
              '--occu_thres', '0.5']
    shard_out = str(tmp_path / 'surf_sharded')  # both write here
    # -c wrapper: the axon plugin pins jax_platforms via jax.config,
    # which beats the inherited JAX_PLATFORMS env var
    launcher = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
                "jax.config.update('jax_compilation_cache_dir', "
                "'/tmp/nerfactor_test_jax_cache'); "
                "jax.config.update("
                "'jax_persistent_cache_min_compile_time_secs', 1); "
                "from nerfactor_tpu.geometry_from_nerf import main; "
                "main()")
    procs = [subprocess.Popen(
        [sys.executable, '-c', launcher,
         '--out_root', shard_out, '--view_shard', '%d/2' % i] + common,
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode(errors='replace')
            for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, 'shard worker exited %d:\n%s' % (
            p.returncode, out)
    # 6 train + 1 vali + 1 test views, all present exactly once
    views = sorted(d for d in os.listdir(shard_out)
                   if os.path.isdir(join(shard_out, d)))
    assert len(views) == 8, views
    # Unsharded reference run: every buffer must match bit for bit
    # (the march is deterministic)
    ref_out = str(tmp_path / 'surf_ref')
    geometry_from_nerf.main(
        ['--out_root', ref_out] + common)
    for view in views:
        for buf in ('xyz.npy', 'normal.npy', 'lvis.npy'):
            a = ioutil.load_np(join(shard_out, view, buf))
            b = ioutil.load_np(join(ref_out, view, buf))
            np.testing.assert_array_equal(
                a, b, err_msg='%s/%s differs from unsharded' % (
                    view, buf))


def test_bf16_march_close_to_f32(tiny_nerf, tmp_path):
    """--bf16_march: the visibility buffers stay within bf16 tolerance
    of the f32 march (the sigma evals are eval-only; accumulation f32)."""
    data_root, trained = tiny_nerf
    from nerfactor_tpu import geometry_from_nerf
    outs = {}
    for tag, extra in (('f32', ['--no-bf16_march']),
                       ('bf16', ['--bf16_march'])):
        out_root = str(tmp_path / ('surf_' + tag))
        geometry_from_nerf.main([
            '--trained_nerf', trained, '--out_root', out_root,
            '--light_h', '4', '--lvis_far', '2',
            '--mlp_chunk', '16384', '--occu_thres', '0.5',
            '--debug'] + extra)
        outs[tag] = ioutil.load_np(
            join(out_root, 'train_000', 'lvis.npy'))
    diff = np.abs(outs['bf16'] - outs['f32'])
    assert diff.mean() < 0.02, "Mean lvis drift too high: %f" % diff.mean()
    assert np.quantile(diff, 0.99) < 0.2, \
        "Tail lvis drift too high: %f" % np.quantile(diff, 0.99)


def test_in_bounds_mask_channel_axis():
    """The bbox mask must agree between row-major (N, 3) points and the
    march's transposed (3, N) layout (channel_axis=0)."""
    import jax.numpy as jnp
    from nerfactor_tpu.geometry_from_nerf import _in_bounds_mask
    rng = np.random.RandomState(0)
    pts = (rng.rand(50, 3) * 4 - 2).astype(np.float32)
    bbox = np.array([-1, 1, -0.5, 1.5, 0, 2], np.float32)
    row = _in_bounds_mask(jnp.asarray(pts), jnp.asarray(bbox))
    col = _in_bounds_mask(jnp.asarray(pts.T), jnp.asarray(bbox),
                          channel_axis=0)
    assert np.asarray(row).any() and not np.asarray(row).all()
    np.testing.assert_array_equal(np.asarray(col), np.asarray(row))
    # bbox=None: all-true with the right shape in both layouts
    assert np.asarray(
        _in_bounds_mask(jnp.asarray(pts), None)).shape == (50,)
    assert np.asarray(_in_bounds_mask(
        jnp.asarray(pts.T), None, channel_axis=0)).shape == (50,)
