"""Image ops shared by models (jit-safe) and host-side tooling (NumPy).

Functions accept either ``jnp`` or ``np`` arrays; jit-safe ones use only
``jnp`` ops so they can live inside compiled steps.
"""

import jax
import jax.numpy as jnp
import numpy as np


def alpha_blend(tensor1, alpha, tensor2=None):
    """Alpha-blends two tensors (reference util/img.py:76-95).

    If ``tensor1`` is (H, W, C) and ``alpha`` (H, W), alpha broadcasts over
    channels. ``tensor2=None`` means a zero background.
    """
    is_np = isinstance(tensor1, np.ndarray)
    xp = np if is_np else jnp
    if tensor2 is None:
        tensor2 = xp.zeros_like(tensor1)
    if tensor1.ndim == 3 and alpha.ndim == 2:
        alpha = alpha[:, :, None]
    return tensor1 * alpha + tensor2 * (1.0 - alpha)


def linear2srgb(tensor_0to1, clip=True):
    """Linear -> sRGB transfer curve (reference util/img.py:140-163)."""
    xp = np if isinstance(tensor_0to1, np.ndarray) else jnp
    if clip:
        tensor_0to1 = xp.clip(tensor_0to1, 0.0, 1.0)
    srgb_linear_thres = 0.0031308
    srgb_linear_coeff = 12.92
    srgb_exp_coeff = 1.055
    srgb_exponent = 2.4
    lin = tensor_0to1 * srgb_linear_coeff
    # Clamp the pow input away from 0 so the backward pass stays finite.
    safe = xp.maximum(tensor_0to1, 1e-12) if xp is jnp else tensor_0to1
    nonlin = srgb_exp_coeff * xp.power(safe, 1.0 / srgb_exponent) \
        - (srgb_exp_coeff - 1.0)
    return xp.where(tensor_0to1 <= srgb_linear_thres, lin, nonlin)


def srgb2linear(tensor_0to1):
    xp = np if isinstance(tensor_0to1, np.ndarray) else jnp
    tensor_0to1 = xp.clip(tensor_0to1, 0.0, 1.0)
    lin = tensor_0to1 / 12.92
    nonlin = xp.power((tensor_0to1 + 0.055) / 1.055, 2.4)
    return xp.where(tensor_0to1 <= 0.04045, lin, nonlin)


def resize(img, new_h=None, new_w=None):
    """Bilinear antialiased resize of an HxW(xC) array.

    Matches the reference's tf.image.resize(..., 'bilinear', antialias=True)
    behavior closely via ``jax.image.resize`` with antialiasing.
    """
    was_np = isinstance(img, np.ndarray)
    h, w = img.shape[0], img.shape[1]
    if new_h is not None and new_w is None:
        new_w = int(round(w / h * new_h))
    elif new_w is not None and new_h is None:
        new_h = int(round(h / w * new_w))
    elif new_h is None and new_w is None:
        raise ValueError("At least one of new height or width required")
    if (new_h, new_w) == (h, w):
        return img
    shape = (new_h, new_w) + img.shape[2:]
    if was_np:
        # Host-side image: keep the op on the CPU backend -- dispatching
        # tiny thumbnail resizes to a (possibly remote) accelerator costs
        # a round trip each
        with jax.default_device(jax.local_devices(backend='cpu')[0]):
            out = jax.image.resize(jnp.asarray(img, jnp.float32), shape,
                                   method='linear', antialias=True)
        return np.asarray(out).astype(img.dtype if np.issubdtype(
            img.dtype, np.floating) else np.float32)
    return jax.image.resize(jnp.asarray(img, jnp.float32), shape,
                            method='linear', antialias=True)


def normalize_uint(arr):
    """uint image -> float in [0, 1]."""
    maxv = np.iinfo(arr.dtype).max
    return arr.astype(np.float32) / maxv


def to_uint(tensor_0to1, dtype=np.uint8):
    arr = np.asarray(tensor_0to1)
    arr = np.clip(arr, 0.0, 1.0)
    return (arr * np.iinfo(dtype).max).astype(dtype)


def rgb2lum(rgb):
    """Rec. 709 luminance."""
    if isinstance(rgb, np.ndarray):
        return rgb @ np.asarray((0.2126, 0.7152, 0.0722),
                                dtype=rgb.dtype)
    weights = jnp.asarray((0.2126, 0.7152, 0.0722), dtype=rgb.dtype)
    # HIGHEST: the TPU default would truncate the f32 operands to bf16
    return jnp.matmul(rgb, weights,
                      precision=jax.lax.Precision.HIGHEST)


def hconcat(img_list, out_w=None):
    total = []
    for im in img_list:
        im = np.asarray(im)
        if im.ndim == 2:
            im = np.dstack([im] * 3)
        if total:
            prev = total[-1]
            if im.shape[0] != prev.shape[0]:
                im = resize(im, new_h=prev.shape[0])
        total.append(im)
    out = np.hstack(total)
    if out_w is not None:
        out = resize(out, new_w=out_w)
    return out


def vconcat(img_list, out_h=None):
    total = []
    for im in img_list:
        im = np.asarray(im)
        if im.ndim == 2:
            im = np.dstack([im] * 3)
        if total:
            prev = total[-1]
            if im.shape[1] != prev.shape[1]:
                im = resize(im, new_w=prev.shape[1])
        total.append(im)
    out = np.vstack(total)
    if out_h is not None:
        out = resize(out, new_h=out_h)
    return out
