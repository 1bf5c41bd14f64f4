"""Data layer tests: paired dataset, sampler, loader, transforms
(reference pattern: tests/test_data/test_paired_image_dataset.py)."""

import cv2
import numpy as np
import pytest

from basicsr4rs_tpu.data import build_dataloader, build_dataset
from basicsr4rs_tpu.data.loader import DataLoader, EnlargedSampler, default_collate
from basicsr4rs_tpu.data.transforms import (augment, mod_crop, paired_central_crop,
                                            paired_random_crop)


@pytest.fixture(scope='module')
def paired_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp('pairs')
    (root / 'gt').mkdir()
    (root / 'lq').mkdir()
    rng = np.random.RandomState(3)
    for i in range(4):
        gt = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        lq = cv2.resize(gt, (12, 12))
        cv2.imwrite(str(root / 'gt' / f'im{i}.png'), gt)
        cv2.imwrite(str(root / 'lq' / f'im{i}.png'), lq)
    return root


def _train_opt(paired_dir):
    return {
        'name': 'TrainSet', 'type': 'PairedImageDataset', 'phase': 'train', 'scale': 4,
        'dataroot_gt': str(paired_dir / 'gt'), 'dataroot_lq': str(paired_dir / 'lq'),
        'io_backend': {'type': 'disk'}, 'gt_size': 32, 'use_hflip': True, 'use_rot': True,
        'batch_size_per_gpu': 2, 'num_worker_per_gpu': 2, 'manual_seed': 0,
    }


def test_paired_dataset_train_item(paired_dir):
    ds = build_dataset(_train_opt(paired_dir))
    assert len(ds) == 4
    item = ds[0]
    assert item['gt'].shape == (32, 32, 3)
    assert item['lq'].shape == (8, 8, 3)
    assert item['gt'].dtype == np.float32
    assert 0 <= item['gt'].min() and item['gt'].max() <= 1
    assert item['gt_path'].endswith('im0.png')


def test_paired_dataset_val_item(paired_dir):
    opt = _train_opt(paired_dir)
    opt['phase'] = 'val'
    ds = build_dataset(opt)
    item = ds[1]
    assert item['gt'].shape == (48, 48, 3)
    assert item['lq'].shape == (12, 12, 3)


def test_dataloader_batching_and_workers(paired_dir):
    opt = _train_opt(paired_dir)
    ds = build_dataset(opt)
    loader = build_dataloader(ds, opt, num_gpu=1, seed=0)
    batches = list(loader)
    assert len(batches) == 2  # 4 items, batch 2, drop_last
    assert batches[0]['gt'].shape == (2, 32, 32, 3)
    assert batches[0]['lq'].shape == (2, 8, 8, 3)
    assert isinstance(batches[0]['gt_path'], list)


def test_loader_worker_count_invariance(paired_dir):
    """Same sampler seed => same item order regardless of worker count."""
    opt = _train_opt(paired_dir)
    opt['use_hflip'] = False
    opt['use_rot'] = False
    ds = build_dataset(opt)
    sampler = EnlargedSampler(len(ds), 1, 0, 1)
    l0 = DataLoader(ds, batch_size=2, sampler=sampler, num_workers=0)
    l4 = DataLoader(ds, batch_size=2, sampler=sampler, num_workers=4)
    paths0 = [b['gt_path'] for b in l0]
    paths4 = [b['gt_path'] for b in l4]
    assert paths0 == paths4


def test_enlarged_sampler():
    s = EnlargedSampler(10, num_replicas=4, rank=1, ratio=2)
    idx = list(iter(s))
    assert len(idx) == len(s) == 5  # ceil(10*2/4)
    assert all(0 <= i < 10 for i in idx)
    s.set_epoch(1)
    idx2 = list(iter(s))
    assert idx != idx2  # epoch reshuffles
    # ranks partition the permutation
    all_idx = []
    for r in range(4):
        sr = EnlargedSampler(10, 4, r, 2)
        sr.set_epoch(0)
        all_idx.extend(list(iter(sr)))
    assert len(all_idx) == 20


def test_collate_nested():
    items = [{'a': np.zeros((2, 2)), 'n': {'x': np.ones(3)}, 'p': 'q', 's': 1.5}] * 3
    batch = default_collate(items)
    assert batch['a'].shape == (3, 2, 2)
    assert batch['n']['x'].shape == (3, 3)
    assert batch['p'] == ['q', 'q', 'q']
    assert batch['s'].shape == (3,)


def test_transforms():
    rng = np.random.default_rng(0)
    gt = np.arange(64 * 64 * 3, dtype=np.float32).reshape(64, 64, 3)
    lq = gt[::4, ::4] / 16.
    g, l = paired_random_crop(gt, lq, 32, 4, rng=rng)
    assert g.shape == (32, 32, 3) and l.shape == (8, 8, 3)
    g, l = paired_central_crop(gt, lq, 32, 4)
    assert g.shape == (32, 32, 3)
    assert mod_crop(np.zeros((13, 14, 3)), 4).shape == (12, 12, 3)

    out, status = augment([gt], hflip=True, rotation=True, return_status=True, rng=rng)
    assert out[0].shape[2] == 3

    # flow-aware augmentation flips the flow signs
    flow = np.ones((8, 8, 2), np.float32)
    rng_fixed = np.random.default_rng(1)
    imgs, flows = augment([gt], hflip=True, rotation=False, flows=[flow], rng=rng_fixed)
    assert flows[0].shape == (8, 8, 2)


def test_scale_mismatch_raises(paired_dir):
    gt = np.zeros((40, 40, 3))
    lq = np.zeros((12, 12, 3))
    with pytest.raises(ValueError, match='Scale mismatches'):
        paired_random_crop(gt, lq, 32, 4)
