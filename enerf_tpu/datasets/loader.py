"""Data loader factory (reference lib/datasets/make_dataset.py:17-104 +
samplers.py).

- ``ViewCountSampler`` replaces EnerfBatchSampler (samplers.py:9-35):
  every batch carries one source-view count drawn from
  ``input_views_num``/``input_views_prob``; the emitted arrays stay padded
  to S_max so device shapes never change (one XLA program).
- iteration cap per epoch (IterationBasedBatchSampler, samplers.py:78-100)
- per-host sharding replaces DistributedSampler (samplers.py:103-159).
- background thread prefetch replaces torch DataLoader workers.
"""

from __future__ import annotations

import importlib
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from enerf_tpu.config import Config


# keys kept on host (eval-only ground truth; 'meta' mirrors the reference's
# to_cuda skip, data_utils.py:564-581). tar_ext/tar_ixt ARE device inputs.
_HOST_ONLY = ("tar_img", "tar_dpt", "tar_mask")


def is_host_only(key: str) -> bool:
    return key == "meta" or any(key == p or key.startswith(p + "_")
                                for p in _HOST_ONLY)


def device_batch(batch_np: Dict) -> Dict:
    """Device-side subset of a host batch as jnp arrays."""
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in batch_np.items()
            if not is_host_only(k)}


def make_dataset(cfg: Config, split: str):
    """Instantiate the dataset named by the config registry key
    (replaces imp.load_source, reference make_dataset.py:17-30)."""
    ds_cfg = cfg.train_dataset if split == "train" else cfg.test_dataset
    module_name = (cfg.train_dataset_module if split == "train"
                   else cfg.test_dataset_module)
    module = importlib.import_module(module_name)
    return module.Dataset(cfg, ds_cfg)


class ViewCountSampler:
    """Yields (index, n_views) tuples; n_views sampled per batch."""

    def __init__(self, n: int, views: List[int], probs: List[float],
                 shuffle: bool, seed: int = 0):
        self.n = n
        self.views = list(views)
        self.probs = list(probs)
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self):
        rng = np.random.RandomState(self.seed + self.epoch)
        order = rng.permutation(self.n) if self.shuffle else np.arange(self.n)
        for idx in order:
            nv = rng.choice(self.views, p=self.probs) if len(self.views) > 1 \
                else self.views[0]
            yield int(idx), int(nv)

    def __len__(self):
        return self.n


class _LockedRng:
    """Mutex around a numpy RandomState so parallel __getitem__ calls stay
    safe (RandomState is not thread-safe). Like torch DataLoader workers,
    draw *order* under concurrency is nondeterministic."""

    def __init__(self, rng):
        self._rng = rng
        self._lock = threading.Lock()

    def __getattr__(self, name):
        fn = getattr(self._rng, name)
        if not callable(fn):
            return fn

        def locked(*a, **kw):
            with self._lock:
                return fn(*a, **kw)
        return locked


class DataLoader:
    """Batched iterator with pipelined thread prefetch (the torch
    DataLoader-workers equivalent). All samples of a batch share the same
    n_views; per-host sharding slices the index stream."""

    def __init__(self, dataset, batch_size: int, sampler: ViewCountSampler,
                 max_iter: Optional[int] = None, num_workers: int = 2,
                 process_index: int = 0, process_count: int = 1,
                 drop_last: bool = True):
        if num_workers > 1 and hasattr(dataset, "rng") \
                and not isinstance(dataset.rng, _LockedRng):
            dataset.rng = _LockedRng(dataset.rng)
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.max_iter = max_iter
        self.num_workers = max(num_workers, 1)
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = drop_last

    def _batches(self) -> Iterator[List]:
        buf: List = []
        nv_cur: Optional[int] = None
        count = 0
        while True:  # cycle epochs to honor max_iter (IterationBased)
            for i, (idx, nv) in enumerate(self.sampler):
                if i % self.process_count != self.process_index:
                    continue  # host shard (DistributedSampler stride)
                if nv_cur is None:
                    nv_cur = nv
                buf.append((idx, nv_cur))
                if len(buf) == self.batch_size:
                    yield buf
                    count += 1
                    if self.max_iter is not None and count >= self.max_iter:
                        return
                    buf, nv_cur = [], None
            if self.max_iter is None:
                if buf and not self.drop_last:
                    yield buf
                return
            self.sampler.set_epoch(self.sampler.epoch + 1)

    def _collate(self, samples: List[Dict]) -> Dict:
        from enerf_tpu import native

        out = {}
        for k in samples[0]:
            if k == "meta":
                out["meta"] = {kk: [s["meta"][kk] for s in samples]
                               for kk in samples[0]["meta"]}
            else:
                out[k] = native.collate([s[k] for s in samples])
        return out

    def __iter__(self):
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 2)
        stop = object()

        def load_batch(batch_idx):
            return self._collate([self.dataset[im] for im in batch_idx])

        def produce():
            # pipeline whole batches across the pool (torch-DataLoader
            # worker equivalent; imageio/cv2 release the GIL), yielding
            # in order
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    pending = deque()
                    it = self._batches()
                    for batch_idx in it:
                        pending.append(pool.submit(load_batch, batch_idx))
                        if len(pending) >= self.num_workers:
                            q.put(pending.popleft().result())
                    while pending:
                        q.put(pending.popleft().result())
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, Exception):
                raise item
            yield item

    def __len__(self):
        if self.max_iter is not None:
            return self.max_iter
        return len(self.sampler) // (self.batch_size * self.process_count)


def make_data_loader(cfg: Config, split: str,
                     max_iter: Optional[int] = None,
                     process_index: int = 0, process_count: int = 1
                     ) -> DataLoader:
    dataset = make_dataset(cfg, split)
    is_train = split == "train"
    ds_cfg = cfg.train_dataset if is_train else cfg.test_dataset
    if is_train:
        views = list(cfg.train.input_views_num)
        probs = list(cfg.train.input_views_prob)
        if max_iter is None:
            max_iter = cfg.ep_iter
    else:
        views = [cfg.enerf.test_input_views]
        probs = [1.0]
    sampler = ViewCountSampler(len(dataset), views, probs, shuffle=is_train)
    return DataLoader(dataset, ds_cfg.batch_size, sampler, max_iter=max_iter,
                      num_workers=cfg.train.num_workers,
                      process_index=process_index,
                      process_count=process_count,
                      drop_last=is_train)
