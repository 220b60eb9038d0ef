"""LPIPS (net-lin, AlexNet, v0.1) as a pure-JAX network.

The reference exposes LPIPS twice:
  * as a metric -- ``third_party/xiuminglib/xiuminglib/metric.py:195-278``
    wraps the frozen ``net-lin_alex_v0.1.pb`` graph (AlexNet features,
    unit-normalized per channel, squared difference, learned 1x1 linear
    heads, spatial average, summed over the five taps; inputs NCHW in
    [-1, 1]);
  * as a loss name -- ``nerfactor/models/base.py:49-55`` parses
    '1e+2lpips' and instantiates ``losses.LPIPS`` ... which the
    reference's own ``nerfactor/losses.py`` never defines (the lpips
    LOSS path is vestigial upstream; no shipped config uses it).

This module reimplements the network itself so both paths are real here.
The ONLY missing piece is the pretrained weights, which neither this
environment nor the reference release ships (PARITY.md "Known gaps"):
:func:`load_torch_weights` accepts the standard checkpoints the moment
one exists on disk --

  * a full ``lpips.LPIPS(net='alex')`` state dict
    (``net.sliceK.J.weight`` + ``linK.model.1.weight`` keys),
  * or a torchvision ``alexnet`` state dict (``features.J.weight``)
    paired with the lin-only ``lpips/weights/v0.1/alex.pth``
    (``linK.model.1.weight`` keys),

deserialized with the CPU torch wheel baked into this image. Until
then, :func:`init_random_params` provides architecture-correct random
parameters so the full forward pass (and its tests) exercise every
layer; ``losses.get_loss_fn('lpips')`` stays gated with an explanatory
error unless a weight path is configured.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

# torchvision AlexNet ``features`` trunk: (out_ch, kernel, stride, pad),
# with 3x3/2 max-pools after the first two taps. LPIPS taps every ReLU
# output of the five conv layers.
_ALEX_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_AFTER = (0, 1)  # max-pool follows taps 1 and 2
_TAP_CHANNELS = tuple(c for c, _, _, _ in _ALEX_CONVS)

# lpips.ScalingLayer constants (v0.1): applied to [-1, 1] inputs
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_random_params(key, lin_positive=True):
    """Architecture-correct random parameters (plumbing/tests only --
    random features are NOT a perceptual metric)."""
    params = {'convs': [], 'lins': []}
    in_ch = 3
    for i, (out_ch, k, _s, _p) in enumerate(_ALEX_CONVS):
        key, k1, k2 = jax.random.split(key, 3)
        w = jax.random.normal(k1, (k, k, in_ch, out_ch)) * (
            1.0 / np.sqrt(k * k * in_ch))
        b = jnp.zeros((out_ch,), jnp.float32)
        params['convs'].append((w.astype(jnp.float32), b))
        in_ch = out_ch
    for c in _TAP_CHANNELS:
        key, k1 = jax.random.split(key)
        lin = jax.random.uniform(k1, (c,), jnp.float32)
        if lin_positive:
            lin = jnp.abs(lin)  # lpips constrains lin weights >= 0
        params['lins'].append(lin)
    return params


def _from_torch(arr):
    return jnp.asarray(np.asarray(arr, np.float32))


def load_torch_weights(path, lin_path=None):
    """Builds LPIPS params from standard torch checkpoints (see module
    docstring for the accepted layouts)."""
    import torch  # CPU wheel, present in this image
    state = torch.load(path, map_location='cpu', weights_only=True)
    state = {k: np.asarray(v) for k, v in state.items()}
    if lin_path is not None:
        lin_state = torch.load(lin_path, map_location='cpu',
                               weights_only=True)
        state.update({k: np.asarray(v) for k, v in lin_state.items()})

    def find(*names):
        for n in names:
            if n in state:
                return state[n]
        raise KeyError('none of %s in checkpoint %s (keys: %s...)' % (
            names, path, sorted(state)[:8]))

    # Backbone convs: full-LPIPS 'net.sliceK.J.*' or torchvision
    # 'features.J.*'. Module indices of the five convs inside
    # torchvision's features trunk / lpips's slices:
    tv_idx = (0, 3, 6, 8, 10)
    slice_of = ((1, 0), (2, 3), (3, 6), (4, 8), (5, 10))
    params = {'convs': [], 'lins': []}
    for i in range(5):
        sk, sj = slice_of[i]
        w = find('net.slice%d.%d.weight' % (sk, sj),
                 'features.%d.weight' % tv_idx[i])
        b = find('net.slice%d.%d.bias' % (sk, sj),
                 'features.%d.bias' % tv_idx[i])
        # torch OIHW -> jax HWIO
        params['convs'].append((
            _from_torch(w).transpose(2, 3, 1, 0), _from_torch(b)))
    for i in range(5):
        lin = find('lin%d.model.1.weight' % i,
                   'lins.%d.model.1.weight' % i)
        params['lins'].append(_from_torch(lin).reshape(-1))
    return params


def _conv(x, w, b, stride, pad):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ('NHWC', 'HWIO', 'NHWC'))
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=dn)
    return y + b


def _maxpool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')


def _features(params, x):
    """(N, H, W, 3) scaled input -> list of five ReLU tap outputs."""
    taps = []
    for i, (spec, (w, b)) in enumerate(zip(_ALEX_CONVS,
                                           params['convs'])):
        _out_ch, _k, stride, pad = spec
        x = jax.nn.relu(_conv(x, w, b, stride, pad))
        taps.append(x)
        if i in _POOL_AFTER:
            x = _maxpool_3x3_s2(x)
    return taps


def _unit_normalize(x, eps=1e-10):
    # lpips.normalize_tensor: x / (||x||_channels + eps)
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips(params, im0, im1):
    """LPIPS distance between (N, H, W, 3) image batches in [0, 1].

    Mirrors the reference metric's contract exactly
    (metric.py:244-278): inputs are mapped to [-1, 1], pushed through
    the scaling layer + AlexNet taps, channel-unit-normalized, squared
    differences run through the learned 1x1 heads, spatially averaged,
    and summed over taps. Returns an (N,) vector (lower is better).
    """
    assert im0.ndim == 4 and im0.shape[-1] == 3, \
        "lpips expects (N, H, W, 3) batches"
    assert im0.shape[1] >= 32 and im0.shape[2] >= 32, \
        "lpips needs images >= 32x32 (five conv/pool stages)"
    shift = _SHIFT.reshape(1, 1, 1, 3)
    scale = _SCALE.reshape(1, 1, 1, 3)

    def prep(im):
        return ((im * 2.0 - 1.0) - shift) / scale

    taps0 = _features(params, prep(im0))
    taps1 = _features(params, prep(im1))
    val = 0.0
    for t0, t1, lin in zip(taps0, taps1, params['lins']):
        d = jnp.square(_unit_normalize(t0) - _unit_normalize(t1))
        per_pix = jnp.tensordot(d, lin, axes=[[-1], [0]])  # 1x1 head
        val = val + jnp.mean(per_pix, axis=(1, 2))
    return val


_WEIGHTS_ENV = 'NERFACTOR_LPIPS_WEIGHTS'
_LIN_ENV = 'NERFACTOR_LPIPS_LIN_WEIGHTS'
_cached = None


def get_params_or_none():
    """Loads weights from $NERFACTOR_LPIPS_WEIGHTS (+ optional
    $NERFACTOR_LPIPS_LIN_WEIGHTS for the torchvision-backbone +
    lin-only layout); None when unset/absent."""
    global _cached
    if _cached is not None:
        return _cached
    path = os.environ.get(_WEIGHTS_ENV)
    if not path or not os.path.exists(path):
        return None
    lin = os.environ.get(_LIN_ENV) or None
    _cached = load_torch_weights(path, lin_path=lin)
    return _cached


# ---- E-LPIPS: self-ensembled LPIPS ------------------------------------
#
# The reference parses the 'elpips' loss name and instantiates
# ``losses.ELPIPS(bs)`` (models/base.py:49-55) -- a class its losses.py
# never defines, so (as with lpips) there is no executable upstream to
# mirror; the semantics come from the E-LPIPS paper (Kettunen et al.
# 2019, "E-LPIPS: Robust Perceptual Image Similarity via Random
# Transformation Ensembles"): average the base LPIPS distance over
# random input transformations applied IDENTICALLY to both images.
# Implemented here with static shapes for jit: integer crop offsets via
# dynamic_slice at a fixed (H-8, W-8) size, x/y mirror flips, an H==W
# transpose (skipped for non-square inputs, where it would change the
# traced shape), color-channel permutation, and a brightness scalar in
# [0.2, 1.0]. Uses the same weight-gated parameters as :func:`lpips`.

_CROP_MARGIN = 8


def _transform_pair(key, im0, im1):
    k_off, k_flip, k_tr, k_perm, k_mul = jax.random.split(key, 5)
    n, h, w, _ = im0.shape
    # Keep the cropped size >= lpips's 32px minimum (static decision)
    ch = h - _CROP_MARGIN if h >= 32 + _CROP_MARGIN else h
    cw = w - _CROP_MARGIN if w >= 32 + _CROP_MARGIN else w
    oy = jax.random.randint(k_off, (), 0, h - ch + 1)
    ox = jax.random.randint(k_off, (), 0, w - cw + 1)

    def crop(im):
        return jax.lax.dynamic_slice(
            im, (0, oy, ox, 0), (n, ch, cw, im.shape[-1]))

    fx, fy = jax.random.bernoulli(k_flip, shape=(2,))
    perm = jax.random.permutation(k_perm, 3)
    mul = jax.random.uniform(k_mul, (), minval=0.2, maxval=1.0)
    do_tr = jax.random.bernoulli(k_tr) if ch == cw else False

    def one(im):
        im = crop(im)
        im = jax.lax.cond(fx, lambda x: jax.lax.rev(x, (2,)),
                          lambda x: x, im)
        im = jax.lax.cond(fy, lambda x: jax.lax.rev(x, (1,)),
                          lambda x: x, im)
        if ch == cw:
            im = jax.lax.cond(
                do_tr, lambda x: jnp.swapaxes(x, 1, 2),
                lambda x: x, im)
        im = im[..., perm]
        return im * mul

    return one(im0), one(im1)


def elpips(params, im0, im1, key, n_draws=8):
    """Ensemble-averaged LPIPS over ``n_draws`` random transformations
    (identical for both images); (N,) vector, lower is better."""
    keys = jax.random.split(key, n_draws)

    def one(k):
        t0, t1 = _transform_pair(k, im0, im1)
        return lpips(params, t0, t1)

    return jnp.mean(jax.vmap(one)(keys), axis=0)
