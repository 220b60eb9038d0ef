"""Light-sphere parameterization and environment-map helpers.

The light parameterization is THE shared contract across the framework:
an equirectangular (lat-long) sphere of h x 2h pixels, plus per-pixel
solid angles for the rendering-equation quadrature. Must match the
reference bit-for-bit (brdf/renderer.py:184-219) since distilled lvis
buffers and trained lights are expressed in it.
"""

import numpy as np


def gen_light_xyz(envmap_h, envmap_w, envmap_radius=1e2):
    """World XYZ of every environment-map pixel + its solid angle.

    Returns:
      xyz: (h, w, 3) float64, points on a sphere of ``envmap_radius``.
      areas: (h, w) float64, solid angles normalized so they sum to 4*pi
        per-column-sum convention of the reference.
    """
    # OpenEXR "latlong": lat in [pi/2, -pi/2] top-down, lng in [pi, -pi]
    # left-right; polar rows/seam columns are excluded by the step offsets.
    lat_step_size = np.pi / (envmap_h + 2)
    lng_step_size = 2 * np.pi / (envmap_w + 2)
    lats = np.linspace(
        np.pi / 2 - lat_step_size, -np.pi / 2 + lat_step_size, envmap_h)
    lngs = np.linspace(
        np.pi - lng_step_size, -np.pi + lng_step_size, envmap_w)
    lngs, lats = np.meshgrid(lngs, lats)

    # lat-lng spherical -> Cartesian (xiuminglib sph2cart convention:
    # z = r sin(lat), x = r cos(lat) cos(lng), y = r cos(lat) sin(lng)).
    z = envmap_radius * np.sin(lats)
    x = envmap_radius * np.cos(lats) * np.cos(lngs)
    y = envmap_radius * np.cos(lats) * np.sin(lngs)
    xyz = np.dstack((x, y, z))

    sin_colat = np.sin(np.pi / 2 - lats)
    areas = 4 * np.pi * sin_colat / np.sum(sin_colat)
    assert 0 not in areas, \
        "There shouldn't be a light pixel that doesn't contribute"
    return xyz, areas


def one_hot_envmap(h, w, i, j, c=3, dtype=np.float32):
    """HxWxC map with ones at pixel (i, j) -- an OLAT light."""
    env = np.zeros((h, w, c), dtype=dtype)
    env[i, j, :] = 1.0
    return env


def make_olat_envmaps(light_h, light_w, olat_inten=200.0, ambient_inten=0.0,
                      limit=None):
    """Ordered dict of name -> (h, w, 3) OLAT environment maps.

    Mirrors models/nerfactor.py:71-84: one map per light pixel, optionally
    with an ambient floor (used on white backgrounds), named '%04d-%04d'.
    """
    from collections import OrderedDict
    olat = OrderedDict()
    ambient = ambient_inten * np.ones((light_h, light_w, 3), dtype=np.float32)
    n_i = light_h if limit is None else min(limit, light_h)
    n_j = light_w if limit is None else min(limit, light_w)
    for i in range(n_i):
        for j in range(n_j):
            envmap = olat_inten * one_hot_envmap(light_h, light_w, i, j) \
                + ambient
            olat['%04d-%04d' % (i, j)] = envmap
    return olat


def vis_light(light_probe, h=None, gamma=4.0):
    """Tonemaps an HDR light probe to a uint8 thumbnail (gamma tonemap,
    reference util/light.py:27-45)."""
    light_probe = np.asarray(light_probe, dtype=np.float32)
    if h is not None and light_probe.shape[0] != h:
        from nerfactor_tpu.ops import img as imgops
        light_probe = imgops.resize(light_probe, new_h=h)
    maxv = light_probe.max()
    if maxv > 0:
        norm = light_probe / maxv
    else:
        norm = light_probe
    img = np.power(norm, 1.0 / gamma)
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def load_light(path, envmap_inten=1.0, envmap_h=None):
    """Loads an environment map from disk ('white'/'point' specials,
    .hdr and .exr via the native codecs in utils, or .npy), optionally
    resizing and scaling.

    Reference: brdf/renderer.py:222-249.
    """
    if path == 'white':
        h = 16 if envmap_h is None else envmap_h
        envmap = np.ones((h, 2 * h, 3), dtype=np.float32)
    elif path == 'point':
        h = 16 if envmap_h is None else envmap_h
        envmap = np.zeros((h, 2 * h, 3), dtype=np.float32)
        i = -h // 4
        j = -int(2 * h * 7 / 8)
        d = 2
        envmap[(i - d):(i + d), (j - d):(j + d), :] = 1
    elif path.endswith('.npy'):
        envmap = np.load(path).astype(np.float32)
    elif path.endswith('.hdr'):
        from nerfactor_tpu.utils.hdr import read_hdr
        envmap = read_hdr(path)
    elif path.endswith('.exr'):
        from nerfactor_tpu.utils.exr import read_exr
        envmap = read_exr(path)
    else:
        import imageio.v2 as imageio
        envmap = np.asarray(imageio.imread(path)).astype(np.float32)
        if envmap.ndim == 2:
            envmap = np.dstack([envmap] * 3)
        envmap = envmap[:, :, :3]
    if envmap_h is not None and envmap.shape[0] != envmap_h:
        from nerfactor_tpu.ops import img as imgops
        envmap = imgops.resize(envmap, new_h=envmap_h)
    return envmap_inten * envmap
