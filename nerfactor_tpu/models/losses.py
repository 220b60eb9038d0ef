"""Loss registry with the reference's config-string parsing.

Configs specify losses as comma-joined '<weight><name>' strings like
'l2' or '1e+2lpips' (reference models/base.py:44-79). All losses support
``keep_batch`` so the driver can compute a per-example loss and average
over the *global* batch under data parallelism.
"""

import jax
import jax.numpy as jnp
import numpy as np


def parse_loss_and_weight(weight_loss_str):
    """'1e+2lpips' -> ('lpips', 100.0); 'l2' -> ('l2', 1.0)."""
    for i in range(len(weight_loss_str), -1, -1):
        try:
            weight = float(weight_loss_str[:i])
        except ValueError:
            continue
        return weight_loss_str[i:], weight
    return weight_loss_str, 1.0


def _reduce(loss, keep_batch):
    if keep_batch:
        axes = tuple(range(1, loss.ndim))
        return jnp.mean(loss, axis=axes) if axes else loss
    return jnp.mean(loss)


def l1(gt, pred, keep_batch=False, weights=None):
    loss = jnp.abs(gt - pred)
    if weights is not None:
        loss = loss * weights
    loss = jnp.mean(loss, axis=-1)
    return _reduce(loss, keep_batch)


def l2(gt, pred, keep_batch=False, weights=None):
    loss = jnp.square(gt - pred)
    if weights is not None:
        loss = loss * weights
    loss = jnp.mean(loss, axis=-1)
    return _reduce(loss, keep_batch)


def mse_lastdim(gt, pred):
    """Per-row MSE over the last dim only (the reference's
    tf.keras.losses.MSE): (..., D) -> (...)."""
    return jnp.mean(jnp.square(gt - pred), axis=-1)


def mae_lastdim(gt, pred):
    return jnp.mean(jnp.abs(gt - pred), axis=-1)


def _gauss_window(size=11, sigma=1.5):
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    return jnp.asarray(g / g.sum(), jnp.float32)


def _depthwise_gauss_valid(img, win):
    """Separable VALID-padded Gaussian filter on (N, H, W, C): each
    channel filtered independently (tf.image.ssim's depthwise conv)."""
    n, h, w, c = img.shape
    x = jnp.moveaxis(img, -1, 1).reshape(n * c, 1, h, w)
    size = win.shape[0]
    kh = win.reshape(1, 1, size, 1)
    kw = win.reshape(1, 1, 1, size)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kh.shape, ('NCHW', 'OIHW', 'NCHW'))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), 'VALID',
                                     dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), 'VALID',
                                     dimension_numbers=dn)
    oh, ow = x.shape[2], x.shape[3]
    return jnp.moveaxis(x.reshape(n, c, oh, ow), 1, -1)


def ssim_index(gt, pred, max_val=1.0, filter_size=11, filter_sigma=1.5):
    """Per-image SSIM on (N, H, W, C), exactly tf.image.ssim's
    algorithm (11x11 Gaussian window, sigma 1.5, VALID padding,
    k1=0.01/k2=0.03, unbiased-covariance compensation 1): returns an
    N-vector in [-1, 1]. Backing the reference's SSIM loss
    (nerfactor/losses.py:68-81)."""
    assert gt.ndim == 4, "ssim expects (N, H, W, C) image batches"
    assert gt.shape[1] >= filter_size and gt.shape[2] >= filter_size, (
        f"images must be at least {filter_size}x{filter_size} for the "
        "windowed SSIM loss")
    win = _gauss_window(filter_size, filter_sigma)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x = _depthwise_gauss_valid(gt, win)
    mu_y = _depthwise_gauss_valid(pred, win)
    mu_xx = _depthwise_gauss_valid(gt * gt, win)
    mu_yy = _depthwise_gauss_valid(pred * pred, win)
    mu_xy = _depthwise_gauss_valid(gt * pred, win)
    var_x = mu_xx - mu_x * mu_x
    var_y = mu_yy - mu_y * mu_y
    cov = mu_xy - mu_x * mu_y
    lum = (2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1)
    cs = (2 * cov + c2) / (var_x + var_y + c2)
    return jnp.mean(lum * cs, axis=(1, 2, 3))


def ssim(gt, pred, keep_batch=False, weights=None, max_val=1.0):
    """(1 - SSIM)/2 on NxHxWxC image batches, with the reference's
    windowed tf.image.ssim semantics (nerfactor/losses.py:68-81;
    cross-validated against tf.image.ssim in
    tests/test_reference_parity.py). ``weights`` alpha-blends both
    images onto black first, as the reference does."""
    if weights is not None:
        gt = gt * weights
        pred = pred * weights
    sim = ssim_index(gt, pred, max_val=max_val)
    loss = (1.0 - sim) / 2.0
    return loss if keep_batch else jnp.mean(loss)


def rgb_to_yuv(rgb):
    """BT.601 RGB->YUV, matching tf.image.rgb_to_yuv."""
    m = jnp.array([[0.299, -0.14714119, 0.61497538],
                   [0.587, -0.28886916, -0.51496512],
                   [0.114, 0.43601035, -0.10001026]], rgb.dtype)
    # HIGHEST: the TPU default would truncate the f32 operands to bf16
    return jnp.matmul(rgb, m, precision=jax.lax.Precision.HIGHEST)


def uvl2(gt, pred, keep_batch=False, weights=None):
    """L2 on the chroma (UV of YUV) channels only (reference
    losses.py:49-67): penalizes hue/saturation error, not brightness."""
    gt_yuv = rgb_to_yuv(jnp.clip(gt, 0.0, 1.0))
    pred_yuv = rgb_to_yuv(jnp.clip(pred, 0.0, 1.0))
    return l2(gt_yuv[..., 1:], pred_yuv[..., 1:], keep_batch=keep_batch,
              weights=weights)


def get_loss_fn(name):
    if name == 'l1':
        return l1
    if name == 'l2':
        return l2
    if name == 'ssim':
        return ssim
    if name == 'uvl2':
        return uvl2
    if name in ('lpips', 'elpips'):
        # The NETWORK is implemented (models/perceptual.py: AlexNet
        # net-lin v0.1 in JAX, mirroring the frozen graph the reference
        # metric wraps, xiuminglib/metric.py:195-278); only the
        # pretrained weights are missing from this environment AND the
        # reference release (.MISSING_LARGE_BLOBS). Point
        # $NERFACTOR_LPIPS_WEIGHTS at a standard lpips/alexnet torch
        # checkpoint to activate. (The reference's own lpips LOSS path
        # is vestigial: base.py:49-55 references a losses.LPIPS class
        # its losses.py never defines.)
        from nerfactor_tpu.models import perceptual
        params = perceptual.get_params_or_none()
        if params is None:
            raise NotImplementedError(
                "%s needs pretrained perceptual weights (absent from this "
                "environment and from the reference release); set "
                "$NERFACTOR_LPIPS_WEIGHTS to a standard lpips/alexnet "
                "torch checkpoint, or use l1/l2/ssim" % name)

        if name == 'lpips':
            def lpips_loss(gt, pred, keep_batch=False, weights=None):
                if weights is not None:  # alpha-blend, like the SSIM loss
                    gt = gt * weights
                    pred = pred * weights
                val = perceptual.lpips(params, gt, pred)
                return val if keep_batch else jnp.mean(val)

            return lpips_loss

        def elpips_loss(gt, pred, keep_batch=False, weights=None,
                        key=None):
            # E-LPIPS needs a PRNG key for its transformation ensemble;
            # a fixed default keeps the loss usable where the driver
            # does not thread one (deterministic ensemble per step)
            if weights is not None:
                gt = gt * weights
                pred = pred * weights
            if key is None:
                key = jax.random.PRNGKey(0)
            val = perceptual.elpips(params, gt, pred, key)
            return val if keep_batch else jnp.mean(val)

        return elpips_loss
    raise NotImplementedError(name)


def init_wloss(loss_config_str):
    """Parses the config 'loss' string into [(weight, fn), ...]."""
    wloss = []
    for x in loss_config_str.split(','):
        name, weight = parse_loss_and_weight(x)
        wloss.append((weight, get_loss_fn(name)))
    return wloss
