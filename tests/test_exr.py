"""Native OpenEXR codec: write/read roundtrips across compressions and
pixel types, plus the light-probe loading integration."""

import numpy as np
import pytest

from nerfactor_tpu.utils import exr


def _probe(h=8, w=16, seed=0):
    rng = np.random.RandomState(seed)
    # HDR-ish content: bright peaks over a dim base
    img = rng.rand(h, w, 3).astype(np.float32) * 0.1
    img[h // 2, w // 4] = [57.0, 21.0, 3.5]
    return img


@pytest.mark.parametrize('compression', ['none', 'zips', 'zip'])
def test_roundtrip_float32(tmp_path, compression):
    img = _probe()
    path = str(tmp_path / ('f32_%s.exr' % compression))
    exr.write_exr(path, img, compression=compression,
                  pixel_type=np.float32)
    out = exr.read_exr(path)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize('compression', ['none', 'zips', 'zip'])
def test_roundtrip_half(tmp_path, compression):
    img = _probe(seed=1)
    path = str(tmp_path / ('f16_%s.exr' % compression))
    exr.write_exr(path, img, compression=compression)
    out = exr.read_exr(path)
    np.testing.assert_array_equal(out, img.astype(np.float16)
                                  .astype(np.float32))


def test_zip_chunking_covers_partial_last_chunk(tmp_path):
    # 35 rows: ZIP chunks of 16 lines -> 16 + 16 + 3
    img = _probe(h=35, w=9, seed=2)
    path = str(tmp_path / 'tall.exr')
    exr.write_exr(path, img, compression='zip', pixel_type=np.float32)
    np.testing.assert_array_equal(exr.read_exr(path), img)


def test_channels_dict_and_luminance_fallback(tmp_path):
    img = _probe(seed=3)
    path = str(tmp_path / 'rgb.exr')
    exr.write_exr(path, img, pixel_type=np.float32)
    ch = exr.read_exr_channels(path)
    assert set(ch) == {'R', 'G', 'B'}
    np.testing.assert_array_equal(ch['G'], img[:, :, 1])


def test_incompressible_chunk_stored_raw(tmp_path):
    # Random half bits barely compress; exercises the stored-raw branch
    rng = np.random.RandomState(4)
    img = rng.rand(4, 255, 3).astype(np.float32) * 1e3
    path = str(tmp_path / 'raw.exr')
    exr.write_exr(path, img, compression='zips', pixel_type=np.float32)
    np.testing.assert_array_equal(exr.read_exr(path), img)


def test_load_light_exr(tmp_path):
    from nerfactor_tpu.ops.light import load_light
    img = _probe(h=16, w=32, seed=5)
    path = str(tmp_path / 'probe.exr')
    exr.write_exr(path, img, pixel_type=np.float32)
    envmap = load_light(path, envmap_inten=2.0)
    np.testing.assert_allclose(envmap, 2.0 * img, rtol=1e-6)
    # With resize (the model loads probes at light_h)
    small = load_light(path, envmap_h=8)
    assert small.shape == (8, 16, 3)
