"""Compares two geometry_from_nerf output trees (alpha/xyz/normal/lvis
buffers per view) -- used to localize the from-NeRF cross-validation
delta between our distillation and the reference's
(PARITY.md round 3). Buffer formats are drop-in compatible.

    python -m tools.diff_surf_buffers --a /tmp/ref_fromnerf/out/surf \
        --b /tmp/ours_surf --views train_000,val_000
"""

import argparse
import json
import os
from os.path import join, exists

import numpy as np


def load_view(d):
    import imageio.v2 as imageio
    alpha = imageio.imread(join(d, 'alpha.png')).astype(np.float32) / 255.
    out = {'alpha': alpha}
    for name in ('xyz', 'normal', 'lvis'):
        p = join(d, name + '.npy')
        out[name] = np.load(p) if exists(p) else None
    return out


def diff_view(a, b):
    fg_a = a['alpha'] > 0.5
    fg_b = b['alpha'] > 0.5
    both = fg_a & fg_b
    stats = {
        'alpha_iou': float((fg_a & fg_b).sum() / max((fg_a | fg_b).sum(), 1)),
        'fg_a': int(fg_a.sum()), 'fg_b': int(fg_b.sum()),
    }
    if a['xyz'] is not None and b['xyz'] is not None and both.any():
        d = np.linalg.norm(a['xyz'][both] - b['xyz'][both], axis=-1)
        stats['xyz_rms'] = float(np.sqrt((d ** 2).mean()))
        stats['xyz_p95'] = float(np.percentile(d, 95))
    if a['normal'] is not None and b['normal'] is not None and both.any():
        na = a['normal'][both]
        nb = b['normal'][both]
        na = na / np.maximum(np.linalg.norm(na, axis=-1, keepdims=True),
                             1e-9)
        nb = nb / np.maximum(np.linalg.norm(nb, axis=-1, keepdims=True),
                             1e-9)
        cos = np.clip((na * nb).sum(-1), -1, 1)
        ang = np.degrees(np.arccos(cos))
        stats['normal_mean_deg'] = float(ang.mean())
        stats['normal_p95_deg'] = float(np.percentile(ang, 95))
    if a['lvis'] is not None and b['lvis'] is not None and both.any():
        la = a['lvis'][both].astype(np.float32)
        lb = b['lvis'][both].astype(np.float32)
        stats['lvis_mae'] = float(np.abs(la - lb).mean())
        stats['lvis_mean_a'] = float(la.mean())
        stats['lvis_mean_b'] = float(lb.mean())
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--a', required=True)
    ap.add_argument('--b', required=True)
    ap.add_argument('--views', default='',
                    help="comma list; default = intersection of both")
    args = ap.parse_args()
    if args.views:
        views = args.views.split(',')
    else:
        views = sorted(set(os.listdir(args.a)) & set(os.listdir(args.b)))
        views = [v for v in views
                 if os.path.isdir(join(args.a, v))
                 and exists(join(args.a, v, 'alpha.png'))]
    for v in views:
        stats = diff_view(load_view(join(args.a, v)),
                          load_view(join(args.b, v)))
        print(v, json.dumps({k: round(x, 4) if isinstance(x, float) else x
                             for k, x in stats.items()}))


if __name__ == '__main__':
    main()
