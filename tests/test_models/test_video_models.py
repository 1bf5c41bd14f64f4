"""Video datasets + models tests (REDS/Vimeo90K/video-test datasets,
VideoBase/EDVR/VideoRecurrent models)."""

import os

import cv2
import numpy as np
import pytest

from basicsr4rs_tpu.data import build_dataset
from basicsr4rs_tpu.models import build_model
from basicsr4rs_tpu.utils.options import yaml_load


@pytest.fixture(scope='module')
def reds_root(tmp_path_factory):
    """Tiny REDS-style tree: clips 000/011 with 12 frames each, x4 pairs."""
    root = tmp_path_factory.mktemp('reds')
    rng = np.random.RandomState(0)
    for clip in ['000', '001', '011']:
        (root / 'gt' / clip).mkdir(parents=True)
        (root / 'lq' / clip).mkdir(parents=True)
        for i in range(12):
            gt = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(root / 'gt' / clip / f'{i:08d}.png'), gt)
            cv2.imwrite(str(root / 'lq' / clip / f'{i:08d}.png'), cv2.resize(gt, (16, 16)))
    meta = root / 'meta_info.txt'
    meta.write_text(''.join(f'{c} 12 (64,64,3)\n' for c in ['000', '001', '011']))
    return root


def test_reds_dataset(reds_root):
    opt = {'name': 'REDS', 'type': 'REDSDataset', 'phase': 'train', 'scale': 4,
           'dataroot_gt': str(reds_root / 'gt'), 'dataroot_lq': str(reds_root / 'lq'),
           'meta_info_file': str(reds_root / 'meta_info.txt'), 'io_backend': {'type': 'disk'},
           'num_frame': 5, 'gt_size': 32, 'interval_list': [1], 'random_reverse': True,
           'use_hflip': True, 'use_rot': True, 'val_partition': 'REDS4', 'manual_seed': 0}
    ds = build_dataset(opt)
    # clips 000 and 011 excluded (REDS4 partition) -> only 001 remains
    assert len(ds) == 12
    item = ds[5]
    assert item['lq'].shape == (5, 8, 8, 3)
    assert item['gt'].shape == (32, 32, 3)
    assert item['key'].startswith('001/')


def test_reds_recurrent_dataset(reds_root):
    opt = {'name': 'REDSrec', 'type': 'REDSRecurrentDataset', 'phase': 'train', 'scale': 4,
           'dataroot_gt': str(reds_root / 'gt'), 'dataroot_lq': str(reds_root / 'lq'),
           'meta_info_file': str(reds_root / 'meta_info.txt'), 'io_backend': {'type': 'disk'},
           'num_frame': 3, 'gt_size': 32, 'val_partition': 'official', 'manual_seed': 0}
    ds = build_dataset(opt)
    assert len(ds) == 36
    item = ds[0]
    assert item['lq'].shape == (3, 8, 8, 3)
    assert item['gt'].shape == (3, 32, 32, 3)


def test_video_test_datasets(reds_root):
    opt = {'name': 'VidTest', 'type': 'VideoTestDataset', 'phase': 'val', 'scale': 4,
           'dataroot_gt': str(reds_root / 'gt'), 'dataroot_lq': str(reds_root / 'lq'),
           'io_backend': {'type': 'disk'}, 'num_frame': 5, 'padding': 'reflection',
           'cache_data': False}
    ds = build_dataset(opt)
    assert len(ds) == 36  # 3 folders x 12 frames
    item = ds[0]
    assert item['lq'].shape == (5, 16, 16, 3)
    assert item['gt'].shape == (64, 64, 3)
    assert item['border'] == 1  # first frame is border

    opt2 = dict(opt)
    opt2.update(type='VideoRecurrentTestDataset', cache_data=True, name='VidRec')
    ds2 = build_dataset(opt2)
    assert len(ds2) == 3
    item2 = ds2[0]
    assert item2['lq'].shape == (12, 16, 16, 3)
    assert item2['gt'].shape == (12, 64, 64, 3)
    assert item2['folder'] == '000'

    opt3 = dict(opt)
    opt3.update(type='VideoTestDUFDataset', use_duf_downsampling=True, name='DUF')
    ds3 = build_dataset(opt3)
    item3 = ds3[0]
    assert item3['lq'].shape == (5, 16, 16, 3)  # DUF-synthesized from GT


def _recurrent_opt():
    return yaml_load("""
name: test_vrec
model_type: VideoRecurrentModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {type: BasicVSR, num_feat: 8, num_block: 1}
path: {pretrain_network_g: ~}
train:
  ema_decay: 0
  fix_flow: 2
  flow_lr_mul: 0.125
  optim_g: {type: Adam, lr: !!float 1e-3}
  scheduler: {type: ConstantLR}
  total_iter: 100
  pixel_opt: {type: CharbonnierLoss, loss_weight: 1.0, reduction: mean}
val:
  val_freq: 100
  flip_seq: false
  metrics:
    psnr: {type: calculate_psnr, crop_border: 0}
""")


def test_video_recurrent_model_train():
    model = build_model(_recurrent_opt())
    rng = np.random.RandomState(0)
    lq = rng.rand(1, 3, 40, 40, 3).astype(np.float32)
    gt = rng.rand(1, 3, 160, 160, 3).astype(np.float32)
    spy0 = np.asarray(model.state.params['spynet']['basic_module_0']['basic_module_0']['kernel']).copy()
    trunk0 = np.asarray(model.state.params['forward_trunk']['main_0']['kernel']).copy()
    model.feed_data({'lq': lq, 'gt': gt})
    model.optimize_parameters(1)
    assert np.isfinite(model.get_current_log()['l_pix'])
    spy1 = np.asarray(model.state.params['spynet']['basic_module_0']['basic_module_0']['kernel'])
    trunk1 = np.asarray(model.state.params['forward_trunk']['main_0']['kernel'])
    # flow net frozen for fix_flow iters; trunk trains
    np.testing.assert_array_equal(spy0, spy1)
    assert not np.allclose(trunk0, trunk1)
    # after fix_flow, spynet trains too
    model.feed_data({'lq': lq, 'gt': gt})
    model.optimize_parameters(2)
    model.feed_data({'lq': lq, 'gt': gt})
    model.optimize_parameters(3)
    spy3 = np.asarray(model.state.params['spynet']['basic_module_0']['basic_module_0']['kernel'])
    assert not np.allclose(spy0, spy3)


def test_video_recurrent_model_test_flip_seq():
    opt = _recurrent_opt()
    opt['val']['flip_seq'] = True
    model = build_model(opt)
    lq = np.random.RandomState(0).rand(1, 3, 40, 40, 3).astype(np.float32)
    model.feed_data({'lq': lq})
    model.test()
    assert model.output.shape == (1, 3, 160, 160, 3)


def test_edvr_model_tsa_warmup():
    opt = yaml_load("""
name: test_edvr
model_type: EDVRModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {type: EDVR, num_feat: 8, num_frame: 5, deformable_groups: 2,
            num_extract_block: 1, num_reconstruct_block: 1, with_tsa: true}
path: {pretrain_network_g: ~}
train:
  ema_decay: 0
  tsa_iter: 2
  dcn_lr_mul: 1.0
  optim_g: {type: Adam, lr: !!float 1e-3}
  scheduler: {type: ConstantLR}
  total_iter: 100
  pixel_opt: {type: CharbonnierLoss, loss_weight: 1.0, reduction: mean}
val:
  val_freq: 100
  metrics:
    psnr: {type: calculate_psnr, crop_border: 0}
""")
    model = build_model(opt)
    rng = np.random.RandomState(0)
    lq = rng.rand(1, 5, 16, 16, 3).astype(np.float32)
    gt = rng.rand(1, 64, 64, 3).astype(np.float32)
    first0 = np.asarray(model.state.params['conv_first']['kernel']).copy()
    tsa0 = np.asarray(model.state.params['fusion']['temporal_attn1']['kernel']).copy()
    model.feed_data({'lq': lq, 'gt': gt})
    model.optimize_parameters(1)
    first1 = np.asarray(model.state.params['conv_first']['kernel'])
    tsa1 = np.asarray(model.state.params['fusion']['temporal_attn1']['kernel'])
    np.testing.assert_array_equal(first0, first1)  # frozen during TSA warmup
    assert not np.allclose(tsa0, tsa1)             # TSA trains
    # unfreeze boundary: all params train AT current_iter == tsa_iter
    # (reference edvr_model.py:49-52)
    model.feed_data({'lq': lq, 'gt': gt})
    model.optimize_parameters(2)
    first2 = np.asarray(model.state.params['conv_first']['kernel'])
    assert not np.allclose(first1, first2)


def test_edvr_dcn_offset_diagnostic():
    """train.log_dcn_offset surfaces max mean|offset| over all DCN sites in
    log_dict — the in-graph replacement for the reference's offset-overflow
    warning (arch_util.py:253-256)."""
    opt = yaml_load("""
name: test_edvr_diag
model_type: EDVRModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {type: EDVR, num_feat: 8, num_frame: 5, deformable_groups: 2,
            num_extract_block: 1, num_reconstruct_block: 1, with_tsa: false}
path: {pretrain_network_g: ~}
train:
  ema_decay: 0
  log_dcn_offset: true
  optim_g: {type: Adam, lr: !!float 1e-3}
  scheduler: {type: ConstantLR}
  total_iter: 100
  pixel_opt: {type: CharbonnierLoss, loss_weight: 1.0, reduction: mean}
val: {val_freq: 100, metrics: {psnr: {type: calculate_psnr, crop_border: 0}}}
""")
    model = build_model(opt)
    rng = np.random.RandomState(0)
    batch = {'lq': rng.rand(1, 5, 16, 16, 3).astype(np.float32),
             'gt': rng.rand(1, 64, 64, 3).astype(np.float32)}
    model.feed_data(batch)
    model.optimize_parameters(1)
    log = model.get_current_log()
    assert 'dcn_offset_abs_mean' in log
    val = float(log['dcn_offset_abs_mean'])
    assert np.isfinite(val) and val >= 0

    # flag off (default): diagnostic absent, step unaffected
    import copy
    opt2 = copy.deepcopy(opt)
    opt2['name'] = 'test_edvr_nodiag'
    del opt2['train']['log_dcn_offset']
    model2 = build_model(opt2)
    model2.feed_data(batch)
    model2.optimize_parameters(1)
    assert 'dcn_offset_abs_mean' not in model2.get_current_log()

def test_basicvsrpp_under_video_recurrent_model_builds():
    """Regression: the model's dummy-init input must satisfy BasicVSR++'s
    >=64px minimum low-res size (a 40px dummy crashed model build)."""
    opt = _recurrent_opt()
    opt['network_g'] = {'type': 'BasicVSRPlusPlus', 'mid_channels': 8,
                        'num_blocks': 1, 'max_residue_magnitude': 10,
                        'is_low_res_input': True, 'spynet_path': None}
    model = build_model(opt)
    rng = np.random.RandomState(1)
    lq = rng.rand(1, 2, 64, 64, 3).astype(np.float32)
    gt = rng.rand(1, 2, 256, 256, 3).astype(np.float32)
    model.feed_data({'lq': lq, 'gt': gt})
    model.optimize_parameters(1)
    assert np.isfinite(model.get_current_log()['l_pix'])
