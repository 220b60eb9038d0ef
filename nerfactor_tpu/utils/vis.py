"""Host-side visualization: HTML galleries, APNG flipbooks, videos, plots,
labeled frames.

Replaces xiuminglib's vis stack (vis/html.py, vis/anim.py, vis/video.py,
vis/plot.py) with dependency-light equivalents: PIL for APNG + text, a
hand-rolled HTML builder, imageio (gated) for mp4.
"""

import os
from os.path import dirname, join, exists

import numpy as np

from nerfactor_tpu.utils.logging import Logger
from nerfactor_tpu.utils import io as ioutil

logger = Logger(loggee="utils/vis")


def _to_uint8(img):
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def _to_rgb(img):
    img = _to_uint8(img)
    if img.ndim == 2:
        img = np.dstack([img] * 3)
    if img.shape[2] == 4:
        img = img[:, :, :3]
    return img


def put_text(img, text, loc_ratio=0.05, size_ratio=0.05, color=(0, 0, 0)):
    """Draws a label onto an image (uint8 or float), returns uint8 RGB."""
    from PIL import Image, ImageDraw
    img = _to_rgb(img)
    pil = Image.fromarray(img)
    draw = ImageDraw.Draw(pil)
    h, w = img.shape[:2]
    xy = (int(loc_ratio * w), int(loc_ratio * h))
    color255 = tuple(int(c * 255) if isinstance(c, float) else int(c)
                     for c in color)
    try:
        from PIL import ImageFont
        font = ImageFont.load_default(size=int(size_ratio * h))
    except Exception:  # older PIL without sized default font
        font = None
    draw.text(xy, text, fill=color255, font=font)
    return np.array(pil)


def make_anim(imgs, outpath, duration_ms=1000):
    """Animated PNG/GIF flipbook of the given frames (reference
    vis/anim.py makes .apng comparisons)."""
    from PIL import Image
    os.makedirs(dirname(outpath), exist_ok=True)
    frames = [Image.fromarray(_to_rgb(x)) for x in imgs]
    frames[0].save(
        outpath, save_all=True, append_images=frames[1:],
        duration=duration_ms, loop=0, default_image=False)
    return outpath


def make_video(frames, outpath, fps=12):
    """mp4 (via imageio-ffmpeg) with an animated-PNG fallback."""
    os.makedirs(dirname(outpath), exist_ok=True)
    frames = [_to_rgb(f) for f in frames]
    if not frames:
        logger.warn("No frames to make a video from: %s", outpath)
        return None
    # Even dimensions required by most codecs
    h, w = frames[0].shape[:2]
    h2, w2 = h - h % 2, w - w % 2
    frames = [f[:h2, :w2] for f in frames]
    try:
        import imageio.v2 as imageio
        writer = imageio.get_writer(outpath, fps=fps)
        for f in frames:
            writer.append_data(f)
        writer.close()
        return outpath
    except Exception as e:  # no ffmpeg backend -> fall back to .apng
        alt = outpath.rsplit('.', 1)[0] + '.apng'
        logger.warn("Video backend unavailable (%s); writing %s", e, alt)
        return make_anim(frames, alt, duration_ms=int(1000 / fps))


def bar_chart(values, outpath, labels=None):
    """Tiny bar chart as an image (replaces xm.vis.plot.Plot.bar)."""
    values = np.atleast_2d(np.asarray(values, dtype=np.float64))
    n_rows, n_groups = values.shape
    h, w = 256, max(256, 4 * max(n_rows, n_groups))
    img = np.ones((h, w, 3), dtype=np.uint8) * 255
    vmin, vmax = np.nanmin(values), np.nanmax(values)
    vrange = (vmax - vmin) if vmax > vmin else 1.0
    flat = values.T.reshape(-1)  # group-major: row cycles fastest
    bar_w = max(1, w // max(len(flat), 1))
    colors = [(31, 119, 180), (255, 127, 14), (44, 160, 44)]
    for i, v in enumerate(flat):
        if not np.isfinite(v):
            continue
        frac = (v - vmin) / vrange
        bh = int(frac * (h - 20))
        x0 = i * bar_w
        c = colors[i % n_rows % len(colors)]  # color = series (row)
        img[h - 10 - bh:h - 10, x0:x0 + max(1, bar_w - 1)] = c
    ioutil.write_img(img, outpath)
    return outpath


class HTML:
    """Self-contained HTML gallery builder (replaces xm.vis.html)."""

    def __init__(self, title="nerfactor_tpu", bgcolor='white',
                 text_color='black'):
        self.title = title
        self.bgcolor = bgcolor
        self.text_color = text_color
        self.headers = []
        self.tables = []

    def add_header(self, text):
        self.headers.append(text)

    def add_table(self):
        table = _HTMLTable()
        self.tables.append(table)
        return table

    def save(self, outpath):
        os.makedirs(dirname(outpath), exist_ok=True)
        parts = [
            "<!DOCTYPE html><html><head><meta charset='utf-8'>",
            "<title>%s</title></head>" % self.title,
            "<body style='background-color:%s;color:%s;"
            "font-family:sans-serif'>" % (self.bgcolor, self.text_color)]
        for htext in self.headers:
            parts.append("<h1>%s</h1>" % htext)
        for table in self.tables:
            parts.append(table.render(outdir=dirname(outpath)))
        parts.append("</body></html>")
        with open(outpath, 'w') as h:
            h.write('\n'.join(parts))
        return outpath


class _HTMLTable:
    def __init__(self):
        self.rows = []

    def add_row(self, cells, types, captions=None):
        self.rows.append((cells, types, captions))

    def render(self, outdir=None):
        out = ["<table border='1' style='border-collapse:collapse'>"]
        for cells, types, captions in self.rows:
            if captions:
                out.append("<tr>" + ''.join(
                    "<td><b>%s</b></td>" % c for c in captions) + "</tr>")
            tds = []
            for cell, typ in zip(cells, types):
                if typ == 'image':
                    src = os.path.relpath(cell, outdir) if outdir else cell
                    tds.append(
                        "<td><a href='%s'><img src='%s' width='256'/></a>"
                        "</td>" % (src, src))
                else:
                    tds.append("<td>%s</td>" % cell)
            out.append("<tr>" + ''.join(tds) + "</tr>")
        out.append("</table>")
        return '\n'.join(out)


def make_frame(batch_dir, layout, data_root=None, rgb_embed_light=None):
    """Collages buffers of one view into a video frame (reference
    util/vis.py:10). ``layout`` is a tuple of row tuples of buffer names
    ('normal', 'lvis', 'nn', 'brdf', 'albedo', 'rgb', 'rgb_olat_X', ...).
    Missing buffers make the frame None (guarded upstream)."""
    from nerfactor_tpu.ops import img as imgops
    rows = []
    for row_names in layout:
        row_imgs = []
        for name in row_names:
            if name == 'nn':
                # Nearest-neighbor real capture, optional
                path = None
                if data_root:
                    cands = ioutil.sortglob(
                        join(data_root, 'test_phys_nn'), '*_nn_*.png')
                    path = cands[0] if cands else None
                if path is None:
                    # placeholder: white
                    ref = row_imgs[0] if row_imgs else None
                    if ref is None:
                        continue
                    row_imgs.append(np.ones_like(ref) * 255)
                    continue
                row_imgs.append(_to_rgb(ioutil.load_img(path)))
                continue
            path = join(batch_dir, 'pred_%s.png' % name)
            if not exists(path):
                return None
            img = _to_rgb(ioutil.load_img(path))
            if name.startswith('rgb') and rgb_embed_light is not None:
                img = _embed_light(img, rgb_embed_light)
            row_imgs.append(img)
        if not row_imgs:
            return None
        rows.append(imgops.hconcat(row_imgs))
    return imgops.vconcat(rows)


def _embed_light(img, light_uint):
    """Insets a light thumbnail at the top-right of a render."""
    img = img.copy()
    lh = max(1, int(0.2 * img.shape[0]))
    lw = max(1, int(lh / light_uint.shape[0] * light_uint.shape[1]))
    from nerfactor_tpu.ops import img as imgops
    thumb = _to_rgb(imgops.resize(
        light_uint.astype(np.float32) / 255.0, new_h=lh, new_w=lw))
    img[:lh, -lw:] = thumb
    return img
