"""Dataset/dataloader builders with auto-discovery
(reference: basicsr/data/__init__.py:25-103)."""

from __future__ import annotations

import importlib
from copy import deepcopy
from os import path as osp

from ..utils.logger import get_root_logger
from ..utils.misc import scandir
from ..utils.registry import DATASET_REGISTRY
from .loader import CPUPrefetcher, DataLoader, DevicePrefetcher, EnlargedSampler, PrefetchGenerator

__all__ = ['build_dataset', 'build_dataloader', 'DataLoader', 'EnlargedSampler',
           'CPUPrefetcher', 'DevicePrefetcher', 'PrefetchGenerator']

# Auto-import all '*_dataset.py' files so their registry decorators run
# (reference data/__init__.py:14-22).
data_folder = osp.dirname(osp.abspath(__file__))
dataset_filenames = [osp.splitext(osp.basename(v))[0] for v in scandir(data_folder)
                     if v.endswith('_dataset.py')]
_dataset_modules = [importlib.import_module(f'basicsr4rs_tpu.data.{file_name}')
                    for file_name in dataset_filenames]


def build_dataset(dataset_opt):
    """Instantiate a dataset by its ``type`` key (reference data/__init__.py:25-37)."""
    dataset_opt = deepcopy(dataset_opt)
    dataset = DATASET_REGISTRY.get(dataset_opt['type'])(dataset_opt)
    logger = get_root_logger()
    logger.info(f'Dataset [{dataset.__class__.__name__}] - {dataset_opt["name"]} is built.')
    return dataset


def build_dataloader(dataset, dataset_opt, num_gpu: int = 1, dist: bool = False,
                     sampler=None, seed=None):
    """Build the phase-appropriate loader (reference data/__init__.py:40-94).

    Train: per-process batch/workers, drop_last; val/test: batch 1, no
    workers. ``num_gpu`` retains the reference's per-device batch semantics:
    with no explicit sampler the global batch is batch_per_gpu * num_gpu
    (devices on one host are fed from a single host loader and sharded by
    the mesh).
    """
    phase = dataset_opt['phase']
    if phase == 'train':
        batch_size = dataset_opt['batch_size_per_gpu'] * max(num_gpu, 1)
        num_workers = dataset_opt.get('num_worker_per_gpu', 0) * max(num_gpu, 1)
        if dataset_opt.get('use_grain'):
            return _build_grain_loader(dataset, batch_size, num_workers,
                                       seed=seed if seed is not None else 0)
        loader = DataLoader(dataset, batch_size=batch_size, sampler=sampler,
                            shuffle=sampler is None and dataset_opt.get('use_shuffle', True),
                            num_workers=num_workers, drop_last=True, seed=seed)
    elif phase in ('val', 'test'):
        loader = DataLoader(dataset, batch_size=1, shuffle=False, num_workers=0)
    else:
        raise ValueError(f"Wrong dataset phase: {phase}. Supported ones are 'train', 'val' and 'test'.")
    return loader


class _GrainLoaderWrapper:
    """Adapts a grain DataLoader to the framework loader contract
    (iterable of collated dict batches + ``set_epoch`` + ``len``). Grain
    reshuffles per epoch internally (epoch-seeded), so ``set_epoch`` is a
    no-op; ``len`` reports batches per epoch for the iteration bookkeeping
    even though the underlying sampler is infinite."""

    def __init__(self, grain_loader, dataset, batch_size):
        self._loader = grain_loader
        self.dataset = dataset
        self._batch_size = batch_size

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return max(len(self.dataset) // self._batch_size, 1)

    def __iter__(self):
        return iter(self._loader)


def _build_grain_loader(dataset, batch_size: int, num_workers: int, seed: int = 0):
    """Multiprocess input pipeline on Google Grain (TPU-native alternative to
    the threaded loader: worker processes decode/augment, the main process
    only collates — keeps the host step time off the critical path).

    Enable per-dataset with ``use_grain: true``.
    """
    import grain.python as gp

    from .loader import default_collate

    class _Source:
        def __len__(self):
            return len(dataset)

        def __getitem__(self, idx):
            return dataset[int(idx)]

    sampler = gp.IndexSampler(
        num_records=len(dataset),
        shard_options=gp.NoSharding(),
        shuffle=True,
        num_epochs=None,  # infinite: iteration-based training never restarts
        seed=seed,
    )
    loader = gp.DataLoader(
        data_source=_Source(),
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size, drop_remainder=True,
                             batch_fn=lambda items: default_collate(list(items)))],
        worker_count=num_workers,
    )
    return _GrainLoaderWrapper(loader, dataset, batch_size)
