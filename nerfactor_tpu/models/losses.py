"""Loss registry with the reference's config-string parsing.

Configs specify losses as comma-joined '<weight><name>' strings like
'l2' or '1e+2lpips' (reference models/base.py:44-79). All losses support
``keep_batch`` so the driver can compute a per-example loss and average
over the *global* batch under data parallelism.
"""

import jax.numpy as jnp


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


def ssim(gt, pred, keep_batch=False, weights=None, max_val=1.0):
    """(1 - SSIM)/2 on NxHxWxC images (stub: reduced-window SSIM).

    Shipped configs all use l2; this exists for config parity with
    'ssim' loss strings on image-shaped batches.
    """
    # Global-statistics SSIM (window = whole image) -- adequate as a loss.
    axes = tuple(range(1, gt.ndim))
    mu_x = jnp.mean(gt, axis=axes, keepdims=True)
    mu_y = jnp.mean(pred, axis=axes, keepdims=True)
    var_x = jnp.var(gt, axis=axes, keepdims=True)
    var_y = jnp.var(pred, axis=axes, keepdims=True)
    cov = jnp.mean((gt - mu_x) * (pred - mu_y), axis=axes, keepdims=True)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    sim = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2))
    loss = (1.0 - jnp.squeeze(sim)) / 2.0
    return loss if keep_batch else jnp.mean(loss)


def rgb_to_yuv(rgb):
    """BT.601 RGB->YUV, matching tf.image.rgb_to_yuv."""
    m = jnp.array([[0.299, -0.14714119, 0.61497538],
                   [0.587, -0.28886916, -0.51496512],
                   [0.114, 0.43601035, -0.10001026]], rgb.dtype)
    return rgb @ m


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
        raise NotImplementedError(
            "%s requires pretrained perceptual weights, which the reference "
            "release also does not ship (.MISSING_LARGE_BLOBS); use "
            "l1/l2/ssim" % name)
    raise NotImplementedError(name)


def init_wloss(loss_config_str):
    """Parses the config 'loss' string into [(weight, fn), ...]."""
    wloss = []
    for x in loss_config_str.split(','):
        name, weight = parse_loss_and_weight(x)
        wloss.append((weight, get_loss_fn(name)))
    return wloss
