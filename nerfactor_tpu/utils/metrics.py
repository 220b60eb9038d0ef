"""Quality metrics: PSNR / SSIM / LPIPS (host-side).

Reference behavior: xiuminglib/metric.py:103 (PSNR with a dtype-implied
dynamic range; models compute PSNR on uint8 images), :152 (SSIM), and
:195 (LPIPS -- the net-lin AlexNet v0.1 graph, reimplemented in JAX at
models/perceptual.py; weight-gated, see that module's docstring).
"""

import numpy as np


def _dynamic_range(drange):
    if drange == 'uint8':
        return 255.0
    if drange == 'float':
        return 1.0
    return float(drange)


def psnr(im1, im2, drange='uint8'):
    """Peak signal-to-noise ratio in dB."""
    im1 = np.asarray(im1, dtype=np.float64)
    im2 = np.asarray(im2, dtype=np.float64)
    mse = np.mean((im1 - im2) ** 2)
    if mse == 0:
        return float('inf')
    maxv = _dynamic_range(drange)
    return float(10.0 * np.log10(maxv ** 2 / mse))


def ssim(im1, im2, drange='uint8'):
    """Mean local SSIM, 7x7 uniform window (skimage's default, which is
    what the reference's xiuminglib metric wraps)."""
    maxv = _dynamic_range(drange)
    im1 = np.asarray(im1, dtype=np.float64) / maxv
    im2 = np.asarray(im2, dtype=np.float64) / maxv
    if im1.ndim == 3:
        return float(np.mean([
            ssim(im1[:, :, c], im2[:, :, c], 'float')
            for c in range(im1.shape[2])]))
    from scipy.ndimage import uniform_filter
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    win = 7
    mu1 = uniform_filter(im1, win)
    mu2 = uniform_filter(im2, win)
    s11 = uniform_filter(im1 * im1, win) - mu1 * mu1
    s22 = uniform_filter(im2 * im2, win) - mu2 * mu2
    s12 = uniform_filter(im1 * im2, win) - mu1 * mu2
    num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
    den = (mu1 ** 2 + mu2 ** 2 + c1) * (s11 + s22 + c2)
    return float(np.mean(num / den))


def lpips(im1, im2, drange='uint8', params=None):
    """LPIPS (lower is better) on HxWx3 (or HxW) images, mirroring the
    reference metric's contract (xiuminglib/metric.py:244-278: scale to
    [-1, 1] by the dtype-implied dynamic range, grayscale stacked to
    RGB, one batch through the net-lin AlexNet). Raises unless weights
    are available -- pass ``params`` or set $NERFACTOR_LPIPS_WEIGHTS
    (models/perceptual.py)."""
    from nerfactor_tpu.models import perceptual
    if params is None:
        params = perceptual.get_params_or_none()
    if params is None:
        raise NotImplementedError(
            "LPIPS needs pretrained weights; set "
            "$NERFACTOR_LPIPS_WEIGHTS (see models/perceptual.py)")
    maxv = _dynamic_range(drange)
    ims = []
    for im in (im1, im2):
        im = np.asarray(im, dtype=np.float32) / maxv  # [0, 1]
        if im.ndim == 2:
            im = np.dstack([im] * 3)
        ims.append(im[None])
    return float(perceptual.lpips(params, ims[0], ims[1])[0])
