"""Radiance .hdr IO: round trip, RLE decoding, and the probe-loading
path of the joint model."""

import numpy as np

from nerfactor_tpu.utils import hdr


def test_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = (rng.rand(16, 32, 3) * 50).astype(np.float32)
    path = str(tmp_path / 'probe.hdr')
    hdr.write_hdr(path, img)
    back = hdr.read_hdr(path)
    assert back.shape == (16, 32, 3)
    # RGBE shares one exponent across channels: error bounded by
    # ~1/256 of the max channel
    err = np.abs(back - img)
    bound = img.max(axis=-1, keepdims=True) / 128 + 1e-3
    assert (err <= bound).all()


def test_rle_scanlines(tmp_path):
    """Hand-encode a new-style RLE file and decode it."""
    w, h = 16, 2
    # Constant color -> pure runs
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., 0] = 200
    rgbe[..., 1] = 100
    rgbe[..., 2] = 50
    rgbe[..., 3] = 128  # exponent 0 -> scale 1/256
    path = str(tmp_path / 'rle.hdr')
    with open(path, 'wb') as f:
        f.write(b'#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n')
        f.write(b'-Y %d +X %d\n' % (h, w))
        for y in range(h):
            f.write(bytes([2, 2, w >> 8, w & 0xff]))
            for c in range(4):
                f.write(bytes([128 + w, int(rgbe[y, 0, c])]))
    img = hdr.read_hdr(path)
    np.testing.assert_allclose(img[..., 0], (200 + 0.5) / 256, rtol=1e-6)
    np.testing.assert_allclose(img[..., 2], (50 + 0.5) / 256, rtol=1e-6)


def test_load_light_hdr(tmp_path):
    from nerfactor_tpu.ops.light import load_light
    rng = np.random.RandomState(1)
    img = (rng.rand(8, 16, 3) * 3).astype(np.float32)
    path = str(tmp_path / 'env.hdr')
    hdr.write_hdr(path, img)
    env = load_light(path, envmap_inten=2.0, envmap_h=4)
    assert env.shape == (4, 8, 3)
    assert abs(env.mean() / (2 * img.mean()) - 1) < 0.1
