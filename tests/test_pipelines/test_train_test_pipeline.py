"""End-to-end pipeline tests: `train_pipeline` and `test_pipeline` driven
through their real CLI surface (sys.argv), on synthetic data."""

import os
import sys

import cv2
import numpy as np
import pytest


@pytest.fixture(scope='module')
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('e2e')
    for sub in ['gt', 'lq']:
        (root / sub).mkdir()
    rng = np.random.RandomState(11)
    for i in range(4):
        gt = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        lq = cv2.resize(gt, (16, 16), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(root / 'gt' / f'{i:03d}.png'), gt)
        cv2.imwrite(str(root / 'lq' / f'{i:03d}.png'), lq)
    return root


def _write_train_yml(root, data_root):
    yml = root / 'train_cfg.yml'
    yml.write_text(f"""
name: e2e_msrresnet
model_type: SRModel
scale: 4
num_gpu: 1
manual_seed: 0

datasets:
  train:
    name: SynTrain
    type: PairedImageDataset
    dataroot_gt: {data_root}/gt
    dataroot_lq: {data_root}/lq
    io_backend: {{type: disk}}
    gt_size: 32
    use_hflip: true
    use_rot: true
    batch_size_per_gpu: 2
    num_worker_per_gpu: 1
    dataset_enlarge_ratio: 1
    prefetch_mode: device
  val:
    name: SynVal
    type: PairedImageDataset
    dataroot_gt: {data_root}/gt
    dataroot_lq: {data_root}/lq
    io_backend: {{type: disk}}

network_g: {{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 8, num_block: 1, upscale: 4}}

path:
  pretrain_network_g: ~
  strict_load_g: true
  resume_state: ~
  experiments_root: {root}/experiments

train:
  ema_decay: 0.999
  optim_g: {{type: Adam, lr: !!float 2e-4, betas: [0.9, 0.99]}}
  scheduler: {{type: CosineAnnealingRestartLR, periods: [8], restart_weights: [1], eta_min: !!float 1e-7}}
  total_iter: 8
  warmup_iter: -1
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}

val:
  val_freq: 4
  save_img: true
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 4, test_y_channel: false}}

logger:
  print_freq: 2
  save_checkpoint_freq: 4
  use_tb_logger: false
""")
    return yml


def test_train_pipeline_e2e(tmp_path, data_root, monkeypatch):
    from basicsr4rs_tpu.train import train_pipeline
    yml = _write_train_yml(tmp_path, data_root)
    monkeypatch.setattr(sys, 'argv', ['train.py', '-opt', str(yml)])
    model = train_pipeline(str(tmp_path))

    exp = tmp_path / 'experiments' / 'e2e_msrresnet'
    assert (exp / 'models' / 'net_g_4').is_dir()
    assert (exp / 'models' / 'net_g_latest').is_dir()
    assert (exp / 'training_states' / '4.state').is_dir()
    assert any(f.startswith('train_') for f in os.listdir(exp))
    assert model.metric_results['psnr'] > 0

    # auto-resume picks up iter 8 state
    monkeypatch.setattr(sys, 'argv', ['train.py', '-opt', str(yml), '--auto_resume'])
    model2 = train_pipeline(str(tmp_path))
    assert model2.current_step() >= 8


def test_test_pipeline_e2e(tmp_path, data_root, monkeypatch):
    # First train briefly to produce a checkpoint.
    from basicsr4rs_tpu.train import train_pipeline
    from basicsr4rs_tpu.test import test_pipeline
    yml = _write_train_yml(tmp_path, data_root)
    monkeypatch.setattr(sys, 'argv', ['train.py', '-opt', str(yml)])
    train_pipeline(str(tmp_path))
    ckpt = tmp_path / 'experiments' / 'e2e_msrresnet' / 'models' / 'net_g_latest'

    test_yml = tmp_path / 'test_cfg.yml'
    test_yml.write_text(f"""
name: e2e_test
model_type: SRModel
scale: 4
num_gpu: 1
manual_seed: 0

datasets:
  test_1:
    name: SynTest
    type: PairedImageDataset
    dataroot_gt: {data_root}/gt
    dataroot_lq: {data_root}/lq
    io_backend: {{type: disk}}

network_g: {{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 8, num_block: 1, upscale: 4}}

path:
  pretrain_network_g: {ckpt}
  param_key_g: params_ema
  strict_load_g: true
  results_root: {tmp_path}/results

val:
  save_img: true
  suffix: ~
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 4}}
    niqe_none: {{type: calculate_niqe_none}}
""")
    monkeypatch.setattr(sys, 'argv', ['test.py', '-opt', str(test_yml)])
    model = test_pipeline(str(tmp_path))
    assert model.metric_results['psnr'] > 0
    results = tmp_path / 'results' / 'e2e_test' / 'visualization' / 'SynTest'
    assert len(list(results.glob('*.png'))) == 4
