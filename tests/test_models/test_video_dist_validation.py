"""Rank-strided distributed video validation (reference
video_base_model.py:46-111 frame striding; video_recurrent_model.py:92-98
folder striding with anti-deadlock padding).

Multi-process behavior is simulated by running ``dist_validation`` once per
rank with ``opt['rank']/opt['world_size']`` overridden (the in-process
``sum_across_processes`` is the identity, so each run leaves that rank's
LOCAL zero-filled-elsewhere arrays behind) and merging the rank-local
results exactly the way the real multi-host sum-reduce does.
"""

import cv2
import numpy as np
import pytest

from basicsr4rs_tpu.data import build_dataset
from basicsr4rs_tpu.models import build_model
from basicsr4rs_tpu.models.video_base_model import VideoBaseModel
from basicsr4rs_tpu.utils.options import yaml_load


@pytest.fixture(scope='module')
def video_root(tmp_path_factory):
    """3 folders x 3 frames of x4 pairs (40px LR keeps SpyNet's 6-level
    pyramid non-degenerate)."""
    root = tmp_path_factory.mktemp('vidval')
    rng = np.random.RandomState(0)
    for clip in ['000', '001', '002']:
        (root / 'gt' / clip).mkdir(parents=True)
        (root / 'lq' / clip).mkdir(parents=True)
        for i in range(3):
            gt = (rng.rand(160, 160, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(root / 'gt' / clip / f'{i:08d}.png'), gt)
            cv2.imwrite(str(root / 'lq' / clip / f'{i:08d}.png'), cv2.resize(gt, (40, 40)))
    return root


class _Loader:
    """Minimal batch-of-1 dataloader shim."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __iter__(self):
        for i in range(len(self.dataset)):
            yield VideoBaseModel._collate_single(self.dataset[i])


def _copy_results(model):
    return {k: np.array(v) for k, v in model.metric_results_per_folder.items()}


def _run_ranks(model, loader, world_size):
    """Run dist_validation once per simulated rank; return rank-local results."""
    per_rank = []
    for rank in range(world_size):
        model.opt['rank'], model.opt['world_size'] = rank, world_size
        model.dist_validation(loader, current_iter=1, tb_logger=None, save_img=False)
        per_rank.append(_copy_results(model))
    model.opt['rank'], model.opt['world_size'] = 0, 1
    return per_rank


def _merged(per_rank):
    folders = per_rank[0].keys()
    return {f: sum(r[f] for r in per_rank) for f in folders}


def _recurrent_model():
    return build_model(yaml_load("""
name: test_vid_dist_val
model_type: VideoRecurrentModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: true
rank: 0
world_size: 1
network_g: {type: BasicVSR, num_feat: 8, num_block: 1}
path: {pretrain_network_g: ~}
train:
  ema_decay: 0
  optim_g: {type: Adam, lr: !!float 1e-3}
  scheduler: {type: ConstantLR}
  total_iter: 100
  pixel_opt: {type: CharbonnierLoss, loss_weight: 1.0, reduction: mean}
val:
  val_freq: 100
  metrics:
    psnr: {type: calculate_psnr, crop_border: 0}
    ssim: {type: calculate_ssim, crop_border: 0}
"""))


def test_recurrent_folder_strided_validation_matches_single(video_root):
    ds = build_dataset({'name': 'VidRec', 'type': 'VideoRecurrentTestDataset',
                        'phase': 'val', 'scale': 4,
                        'dataroot_gt': str(video_root / 'gt'),
                        'dataroot_lq': str(video_root / 'lq'),
                        'io_backend': {'type': 'disk'}, 'num_frame': -1,
                        'cache_data': True})
    assert len(ds) == 3
    model = _recurrent_model()
    loader = _Loader(ds)

    model.nondist_validation(loader, current_iter=1, tb_logger=None, save_img=False)
    single = _copy_results(model)
    assert all(v.shape == (3, 2) for v in single.values())
    assert all((v > 0).all() for v in single.values())

    per_rank = _run_ranks(model, loader, world_size=2)
    # rank 0 took folders 0,2; rank 1 took folder 1 plus an UNRECORDED
    # padding replay of the last folder (3 folders, world 2 -> 1 pad)
    assert (per_rank[0]['000'] > 0).all() and (per_rank[0]['002'] > 0).all()
    assert (per_rank[0]['001'] == 0).all()
    assert (per_rank[1]['001'] > 0).all(), 'non-rank0 did not participate'
    assert (per_rank[1]['000'] == 0).all()
    assert (per_rank[1]['002'] == 0).all(), 'padding replay must not be recorded'

    merged = _merged(per_rank)
    for f in single:
        np.testing.assert_allclose(merged[f], single[f], rtol=1e-6,
                                   err_msg=f'folder {f} dist != single')


def test_base_frame_strided_validation_matches_single(video_root):
    ds = build_dataset({'name': 'VidTest', 'type': 'VideoTestDataset',
                        'phase': 'val', 'scale': 4,
                        'dataroot_gt': str(video_root / 'gt'),
                        'dataroot_lq': str(video_root / 'lq'),
                        'io_backend': {'type': 'disk'}, 'num_frame': 3,
                        'padding': 'reflection', 'cache_data': False})
    assert len(ds) == 9  # 3 folders x 3 frames
    model = build_model(yaml_load("""
name: test_vid_dist_val_base
model_type: VideoBaseModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: true
rank: 0
world_size: 1
network_g: {type: EDVR, num_feat: 8, num_frame: 3, deformable_groups: 2,
            num_extract_block: 1, num_reconstruct_block: 1, with_tsa: false}
path: {pretrain_network_g: ~}
train:
  ema_decay: 0
  optim_g: {type: Adam, lr: !!float 1e-3}
  scheduler: {type: ConstantLR}
  total_iter: 100
  pixel_opt: {type: CharbonnierLoss, loss_weight: 1.0, reduction: mean}
val:
  val_freq: 100
  metrics:
    psnr: {type: calculate_psnr, crop_border: 0}
"""))
    loader = _Loader(ds)

    model.nondist_validation(loader, current_iter=1, tb_logger=None, save_img=False)
    single = _copy_results(model)
    assert all(v.shape == (3, 1) for v in single.values())

    per_rank = _run_ranks(model, loader, world_size=2)
    # every rank filled SOME rows, none filled all of them
    for r in per_rank:
        flat = np.concatenate([r[f] for f in sorted(r)])
        assert (flat > 0).any()
        assert (flat == 0).any()
    merged = _merged(per_rank)
    for f in single:
        np.testing.assert_allclose(merged[f], single[f], rtol=1e-6)
