"""UVL2 chroma loss + loss-string parsing + the trainvali profiler
flag."""

import numpy as np
import jax.numpy as jnp

from nerfactor_tpu.models import losses


def test_rgb_to_yuv_oracle():
    # Pure colors against BT.601 textbook values
    rgb = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0],
                       [1.0, 1.0, 1.0]])
    yuv = np.asarray(losses.rgb_to_yuv(rgb))
    np.testing.assert_allclose(yuv[:, 0], [0.299, 0.587, 0.114, 1.0],
                               atol=1e-6)
    np.testing.assert_allclose(yuv[3, 1:], [0, 0], atol=1e-6)  # white


def test_uvl2_ignores_brightness():
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(32, 3).astype(np.float32)) * 0.5
    # A pure luminance shift has (nearly) zero chroma loss
    shifted = jnp.clip(rgb + 0.2, 0, 1)
    loss_lum = float(losses.uvl2(rgb, shifted))
    # A hue shift has a large one
    swapped = rgb[:, ::-1]
    loss_hue = float(losses.uvl2(rgb, swapped))
    assert loss_lum < 1e-4
    assert loss_hue > 10 * max(loss_lum, 1e-6)


def test_uvl2_in_registry():
    wloss = losses.init_wloss('1e+1uvl2,l2')
    assert len(wloss) == 2
    assert wloss[0][0] == 10.0 and wloss[0][1] is losses.uvl2
    assert wloss[1][0] == 1.0 and wloss[1][1] is losses.l2
    gt = jnp.zeros((4, 3))
    pred = jnp.ones((4, 3)) * 0.5
    out = wloss[0][1](gt, pred, keep_batch=True)
    assert out.shape == (4,)


def test_trainvali_profile_flag(tmp_path):
    """--profile_steps captures a trace directory during training."""
    from os.path import join, exists
    from tests import synth
    from nerfactor_tpu import trainvali
    root = str(tmp_path / 'scene')
    out = str(tmp_path / 'out')
    synth.make_scene(root, n_train=2, n_vali=1, n_test=1, imh=8)
    override = ','.join([
        'data_root=%s' % root, 'outroot=%s' % out, 'imh=8',
        'epochs=2', 'ckpt_period=2', 'vali_period=-1',
        'n_rays_per_step=32', 'n_samples_coarse=8', 'n_samples_fine=8',
        'mlp_width=8', 'mlp_depth=2', 'mlp_skip_at=1', 'mlp_chunk=2048',
        'lr=5e-4'])
    trainvali.main(['--config', 'nerf.ini', '--config_override', override,
                    '--profile_steps', '1'])
    profile_dir = join(out, 'lr5e-4', 'profile')
    assert exists(profile_dir) and len(list(__import__('os').walk(
        profile_dir))) > 0
