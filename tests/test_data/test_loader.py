

def test_grain_loader_backend(tmp_path):
    """use_grain: true builds a Grain multiprocess pipeline with the same
    batch contract as the threaded loader."""
    import cv2
    import numpy as np
    from basicsr4rs_tpu.data import build_dataloader, build_dataset
    gt_dir, lq_dir = tmp_path / 'gt', tmp_path / 'lq'
    gt_dir.mkdir(); lq_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        gt = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(gt_dir / f'{i}.png'), gt)
        cv2.imwrite(str(lq_dir / f'{i}.png'), cv2.resize(gt, (8, 8)))
    opt = {'name': 'g', 'type': 'PairedImageDataset', 'phase': 'train', 'scale': 4,
           'gt_size': 16, 'dataroot_gt': str(gt_dir), 'dataroot_lq': str(lq_dir),
           'io_backend': {'type': 'disk'}, 'use_hflip': False, 'use_rot': False,
           'batch_size_per_gpu': 2, 'num_worker_per_gpu': 0,
           'use_grain': True}
    ds = build_dataset(opt)
    loader = build_dataloader(ds, opt, num_gpu=1, seed=0)
    loader.set_epoch(0)
    it = iter(loader)
    batch = next(it)
    assert batch['gt'].shape == (2, 16, 16, 3)
    assert batch['lq'].shape == (2, 4, 4, 3)
    assert len(batch['gt_path']) == 2
    # infinite sampler: more batches than one epoch are available
    for _ in range(5):
        next(it)
