"""Framework-owned data loading: sampler + threaded prefetching loader.

TPU-native re-design of the reference's torch DataLoader stack
(reference: basicsr/data/__init__.py:40-103, data_sampler.py:6-49,
prefetch_dataloader.py:39-123). Datasets are plain map-style objects
(``__len__`` / ``__getitem__`` returning dicts of numpy arrays / strings).
Decoding and augmentation are cv2/numpy, which release the GIL, so a
thread-pool pipeline keeps the input path off the critical path; device
transfer overlap is handled separately by the device prefetcher
(the CUDA-side-stream analog on TPU is simply JAX's async dispatch +
one-batch lookahead ``device_put``).
"""

from __future__ import annotations

import math
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


class EnlargedSampler:
    """Rank-strided sampler that virtually enlarges the dataset ``ratio``x so
    iteration-based training avoids frequent epoch restarts
    (reference: basicsr/data/data_sampler.py:6-49)."""

    def __init__(self, dataset_size: int, num_replicas: int = 1, rank: int = 0, ratio: int = 1):
        self.dataset_size = dataset_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.num_samples = math.ceil(dataset_size * ratio / num_replicas)
        self.total_size = self.num_samples * self.num_replicas

    def __iter__(self) -> Iterator[int]:
        # Epoch-seeded permutation -> modulo into dataset range -> rank stride.
        g = np.random.default_rng(self.epoch)
        indices = g.permutation(self.total_size) % self.dataset_size
        indices = indices[self.rank:self.total_size:self.num_replicas]
        assert len(indices) == self.num_samples
        return iter(indices.tolist())

    def __len__(self) -> int:
        return self.num_samples

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch


def default_collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack dict-of-array items into dict-of-batched-arrays; non-arrays
    become lists. Nested dicts (RS L2S datasets) are collated recursively."""
    batch: Dict[str, Any] = {}
    first = items[0]
    for key, value in first.items():
        vals = [it[key] for it in items]
        if isinstance(value, np.ndarray):
            batch[key] = np.stack(vals, axis=0)
        elif isinstance(value, dict):
            batch[key] = default_collate(vals)
        elif isinstance(value, (int, float, np.integer, np.floating)):
            batch[key] = np.asarray(vals)
        else:
            batch[key] = vals
    return batch


class DataLoader:
    """Order-preserving thread-pool loader with bounded prefetch.

    Items are submitted to a worker pool in sampler order and yielded in
    order, so results are deterministic given the sampler seed regardless of
    worker count (the reference achieves this with torch's index queues).
    """

    def __init__(self,
                 dataset,
                 batch_size: int = 1,
                 sampler: Optional[EnlargedSampler] = None,
                 shuffle: bool = False,
                 num_workers: int = 0,
                 drop_last: bool = False,
                 collate_fn=default_collate,
                 prefetch_factor: int = 2,
                 seed: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.prefetch_factor = max(prefetch_factor, 1)
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if self.sampler is not None:
            self.sampler.set_epoch(epoch)

    def _indices(self) -> List[int]:
        if self.sampler is not None:
            return list(iter(self.sampler))
        indices = list(range(len(self.dataset)))
        if self.shuffle:
            g = np.random.default_rng(None if self.seed is None else self.seed + self._epoch)
            g.shuffle(indices)
        return indices

    def __len__(self) -> int:
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    def __iter__(self):
        indices = self._indices()
        if self.drop_last:
            indices = indices[:(len(indices) // self.batch_size) * self.batch_size]
        batches = [indices[i:i + self.batch_size] for i in range(0, len(indices), self.batch_size)]

        if self.num_workers <= 0:
            for batch_idx in batches:
                yield self.collate_fn([self.dataset[i] for i in batch_idx])
            return

        # Pipelined: keep `prefetch_factor * num_workers` items in flight,
        # yield strictly in order.
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            max_inflight = self.prefetch_factor * self.num_workers
            flat = [i for b in batches for i in b]
            futures: "queue.deque" = __import__('collections').deque()
            it = iter(flat)

            def submit_next():
                try:
                    idx = next(it)
                except StopIteration:
                    return False
                futures.append(pool.submit(self.dataset.__getitem__, idx))
                return True

            for _ in range(max_inflight):
                if not submit_next():
                    break

            for batch_idx in batches:
                items = []
                for _ in batch_idx:
                    items.append(futures.popleft().result())
                    submit_next()
                yield self.collate_fn(items)


class CPUPrefetcher:
    """Plain iterator wrapper (reference prefetch_dataloader.py:61-79)."""

    def __init__(self, loader: DataLoader):
        self.ori_loader = loader
        self.loader = iter(loader)

    def next(self):
        try:
            return next(self.loader)
        except StopIteration:
            return None

    def reset(self):
        self.loader = iter(self.ori_loader)


class DevicePrefetcher:
    """One-batch-lookahead host->device prefetcher.

    TPU analog of the reference CUDAPrefetcher (prefetch_dataloader.py:82-123):
    instead of a CUDA side stream, we rely on JAX's asynchronous dispatch —
    ``put_fn`` (typically a sharded ``jax.device_put``) is issued for batch
    N+1 while the step on batch N runs, overlapping PCIe/ICI transfer with
    compute.
    """

    def __init__(self, loader: DataLoader, put_fn):
        self.ori_loader = loader
        self.put_fn = put_fn
        self.loader = iter(loader)
        self._preload()

    def _preload(self):
        try:
            batch = next(self.loader)
        except StopIteration:
            self.batch = None
            return
        self.batch = self.put_fn(batch)  # async transfer starts now

    def next(self):
        batch = self.batch
        if batch is not None:
            self._preload()
        return batch

    def reset(self):
        self.loader = iter(self.ori_loader)
        self._preload()


class PrefetchGenerator(threading.Thread):
    """Background-thread generator (reference prefetch_dataloader.py:8-36)."""

    def __init__(self, generator, num_prefetch_queue: int):
        threading.Thread.__init__(self)
        self.queue = queue.Queue(num_prefetch_queue)
        self.generator = generator
        self.daemon = True
        self.start()

    def run(self):
        for item in self.generator:
            self.queue.put(item)
        self.queue.put(None)

    def __next__(self):
        next_item = self.queue.get()
        if next_item is None:
            raise StopIteration
        return next_item

    def __iter__(self):
        return self
