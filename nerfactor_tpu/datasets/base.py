"""Dataset base: a NumPy pipeline replacing the reference's tf.data stack.

Pipeline semantics preserved from datasets/base.py:84-114 of the
reference:
  * one element per *view* (or per BRDF identity);
  * expensive decoding is done once and cached in RAM (tf.data .cache());
  * randomness (ray subsampling) happens post-cache, per epoch;
  * train mode shuffles element order per epoch; vali/test don't;
  * train batch = ``n_rays_per_step`` random rays of one view; vali/test
    batch = all rays of one view.

A background prefetch thread overlaps host-side decode/sampling with the
device step, standing in for tf.data's prefetch.
"""

import queue
import threading

import numpy as np

from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="datasets/base")


class Dataset:
    def __init__(self, config, mode, debug=False, seed=0):
        assert mode in ('train', 'vali', 'test'), \
            "Accepted modes: train / vali / test, got %s" % mode
        self.config = config
        self.mode = mode
        self.debug = debug
        self.seed = seed
        if debug:
            logger.warn("Dataset in debug mode; behavior may be different")
        self._cache = {}
        self._cache_enabled = config.getboolean('cache', fallback=True)
        self._epoch = 0
        self.files = self._glob()
        if not self.files:
            raise FileNotFoundError("No file to process into a dataset")
        self.bs = self._get_batch_size()

    # ------ to be overridden ------

    def _glob(self):
        raise NotImplementedError

    def _get_batch_size(self):
        bs = self.config.getint('bs', fallback=None)
        if bs is None:
            raise ValueError(
                "Specify 'bs' in the config or override _get_batch_size")
        return bs

    def _load_one(self, path):
        """Decodes one element (view/identity) into a dict of np arrays.
        Output of this is cached."""
        raise NotImplementedError

    def _postprocess(self, data, rng):
        """Per-epoch randomness (e.g., ray sampling) -- NOT cached."""
        return data

    # ------ pipeline ------

    def get_n_views(self):
        return len(self.files)

    def _get_cached(self, path):
        key = str(path)
        if self._cache_enabled and key in self._cache:
            return self._cache[key]
        data = self._load_one(path)
        if self._cache_enabled:
            self._cache[key] = data
        return data

    def build_pipeline(self, no_shuffle=False, prefetch=2, take=None,
                       **_ignored):
        """Returns an iterable over one epoch of batches. Iterate it again
        for the next epoch (reshuffled)."""
        return _EpochIterable(self, no_shuffle=no_shuffle, prefetch=prefetch,
                              take=take)

    def _epoch_order(self, epoch, no_shuffle):
        order = np.arange(len(self.files))
        if self.mode == 'train' and not no_shuffle:
            rng = np.random.default_rng((self.seed, epoch))
            rng.shuffle(order)
        return order

    def _make_batch(self, idx, epoch):
        path = self.files[idx]
        data = self._get_cached(path)
        rng = np.random.default_rng((self.seed, epoch, idx, 7))
        return self._postprocess(data, rng)


class _EpochIterable:
    def __init__(self, dataset, no_shuffle, prefetch, take=None):
        self.dataset = dataset
        self.no_shuffle = no_shuffle
        self.prefetch = prefetch
        self.take = take
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset.files)
        return n if self.take is None else min(self.take, n)

    def __iter__(self):
        epoch = self._epoch
        self._epoch += 1
        ds = self.dataset
        order = ds._epoch_order(epoch, self.no_shuffle)
        if self.take is not None:
            order = order[:self.take]
        if self.prefetch <= 0:
            for idx in order:
                yield ds._make_batch(int(idx), epoch)
            return
        q = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()
        err = []

        def producer():
            try:
                for idx in order:
                    q.put(ds._make_batch(int(idx), epoch))
            except BaseException as e:  # surfaced in consumer
                err.append(e)
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            yield item
        t.join()
        if err:
            raise err[0]
