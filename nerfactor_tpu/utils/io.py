"""Host-side IO: json, npy/npz, images, output-dir management."""

import json
import os
from os.path import dirname, exists, isdir
from shutil import rmtree

import numpy as np

from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="utils/io")


def read_json(path):
    with open(path, 'r') as h:
        return json.load(h)


def write_json(data, path):
    out_dir = dirname(path)
    if out_dir and not exists(out_dir):
        os.makedirs(out_dir, exist_ok=True)
    with open(path, 'w') as h:
        json.dump(data, h, indent=4, sort_keys=True)


def load_np(np_f):
    if np_f.endswith('.npy'):
        with open(np_f, 'rb') as h:
            return np.load(h)
    with open(np_f, 'rb') as h:
        data = np.load(h, allow_pickle=True)
        return dict(data)


def save_np(arr, path):
    os.makedirs(dirname(path), exist_ok=True)
    with open(path, 'wb') as h:
        np.save(h, arr)


def save_npz(data, path):
    os.makedirs(dirname(path), exist_ok=True)
    with open(path, 'wb') as h:
        np.savez(h, **data)


def all_exist(path_dict):
    return all(exists(v) for v in path_dict.values())


def prepare_outdir(outdir, overwrite=False, quiet=False):
    if isdir(outdir):
        if not quiet:
            logger.info("Output directory already exists:\n\t%s", outdir)
        if overwrite:
            rmtree(outdir)
            if not quiet:
                logger.warn("Output directory wiped:\n\t%s", outdir)
        else:
            if not quiet:
                logger.info("Overwrite is off, so doing nothing")
            return
    os.makedirs(outdir, exist_ok=True)


def sortglob(directory, filename='*', ext=None):
    """Sorted glob, reference xm.os.sortglob behavior."""
    import glob as _glob
    if ext is None:
        pattern = os.path.join(directory, filename)
        return sorted(_glob.glob(pattern))
    if isinstance(ext, str):
        ext = (ext,)
    paths = []
    for e in ext:
        e = e.lstrip('.')
        paths += _glob.glob(os.path.join(directory, filename + '.' + e))
    return sorted(paths)


def load_img(path, force_rgba=False):
    """Loads an image into a float array in [0, 1]."""
    import imageio.v2 as imageio
    arr = np.asarray(imageio.imread(path))
    if np.issubdtype(arr.dtype, np.integer):
        arr = arr.astype(np.float32) / np.iinfo(arr.dtype).max
    else:
        arr = arr.astype(np.float32)
    if force_rgba and (arr.ndim == 2 or arr.shape[2] == 3):
        if arr.ndim == 2:
            arr = np.dstack([arr] * 3)
        alpha = np.ones_like(arr[:, :, :1])
        arr = np.concatenate([arr, alpha], axis=2)
    return arr


def write_img(arr_0to1, path, clip=True):
    """Writes a float [0,1] (or uint8) array as an image; returns uint8."""
    import imageio.v2 as imageio
    os.makedirs(dirname(path), exist_ok=True)
    arr = np.asarray(arr_0to1)
    if arr.dtype != np.uint8:
        if clip:
            arr = np.clip(arr, 0.0, 1.0)
        arr = (arr * 255).astype(np.uint8)
    imageio.imwrite(path, arr)
    return arr
