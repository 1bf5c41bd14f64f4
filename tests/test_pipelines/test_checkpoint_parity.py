"""Checkpoint-parity harness (SURVEY §7 stage-2 exit criterion).

Two tiers:

1. ``test_synthetic_pth_end_to_end`` — always runs: writes a synthetic
   reference-layout ``.pth`` (torch tensors, basicsr key names, NCHW), loads
   it through the REAL model path (``pretrain_network_g`` in an SRModel
   config), and asserts our jitted forward matches the torch reference
   forward with those exact weights. This pins the whole
   .pth -> NHWC -> registry -> model chain without official weights.

2. ``test_msrresnet_set5_psnr`` — weights-gated: when the official
   reproduced checkpoint and Set5 are present (zero-egress environments
   skip), runs the real test pipeline and asserts Set5 PSNR 30.2468 +- 0.01
   (docs/ModelZoo.md:70). Provide the files at::

       experiments/pretrained_models/MSRResNet_x4.pth
       datasets/Set5/GTmod12/*.png + datasets/Set5/LRbicx4/*.png

   or point BASICSR4RS_PRETRAINED / BASICSR4RS_DATASETS at their roots.
"""

import os
from os import path as osp

import numpy as np
import pytest

REPO = osp.join(osp.dirname(osp.abspath(__file__)), '..', '..')
PRETRAINED_ROOT = os.environ.get('BASICSR4RS_PRETRAINED',
                                 osp.join(REPO, 'experiments', 'pretrained_models'))
DATASETS_ROOT = os.environ.get('BASICSR4RS_DATASETS', osp.join(REPO, 'datasets'))
MSRRESNET_PTH = osp.join(PRETRAINED_ROOT, 'MSRResNet_x4.pth')
SET5_GT = osp.join(DATASETS_ROOT, 'Set5', 'GTmod12')
SET5_LQ = osp.join(DATASETS_ROOT, 'Set5', 'LRbicx4')


def test_synthetic_pth_end_to_end(tmp_path):
    import sys
    import torch
    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
    import ref_loader

    torch.manual_seed(0)
    m = ref_loader.load_ref_module('basicsr/archs/srresnet_arch.py')
    ref = m.MSRResNet(num_in_ch=3, num_out_ch=3, num_feat=16, num_block=2,
                      upscale=4).eval()
    pth = tmp_path / 'net_g_synth.pth'
    torch.save({'params': ref.state_dict(), 'iter': 123}, pth)

    from basicsr4rs_tpu.models import build_model
    from basicsr4rs_tpu.utils.options import yaml_load
    opt = yaml_load(f"""
name: test_ckpt_parity
model_type: SRModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: false
dist: false
rank: 0
world_size: 1
network_g: {{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 16, num_block: 2, upscale: 4}}
path: {{pretrain_network_g: {pth}, param_key_g: params, strict_load_g: true}}
val:
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 4}}
""")
    model = build_model(opt)

    x = np.random.RandomState(1).rand(1, 24, 24, 3).astype(np.float32)
    model.feed_data({'lq': x})
    model.test()
    ours = np.asarray(model.output)[0]

    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours, want, atol=2e-5, rtol=1e-4)


@pytest.mark.skipif(
    not (osp.isfile(MSRRESNET_PTH) and osp.isdir(SET5_GT) and osp.isdir(SET5_LQ)),
    reason='official MSRResNet_x4.pth / Set5 not available (zero-egress env); '
           'see module docstring for the file layout to enable this test')
def test_msrresnet_set5_psnr(tmp_path):
    """docs/ModelZoo.md:70 — MSRResNet x4 Set5 PSNR 30.2468 (crop 4, RGB)."""
    from basicsr4rs_tpu.test import test_pipeline
    opt_file = tmp_path / 'set5.yml'
    opt_file.write_text(f"""
name: MSRResNet_x4_Set5_parity
model_type: SRModel
scale: 4
num_gpu: 1
manual_seed: 0

datasets:
  test_1:
    name: Set5
    type: PairedImageDataset
    dataroot_gt: {SET5_GT}
    dataroot_lq: {SET5_LQ}
    io_backend: {{type: disk}}

network_g: {{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 64, num_block: 16, upscale: 4}}

path:
  pretrain_network_g: {MSRRESNET_PTH}
  param_key_g: params
  strict_load_g: true
  results_root: {tmp_path}/results
  log: {tmp_path}/results
  visualization: {tmp_path}/results/vis

val:
  save_img: false
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 4, test_y_channel: false}}
""")
    import sys
    argv = sys.argv
    sys.argv = ['test.py', '-opt', str(opt_file)]
    try:
        model = test_pipeline(REPO)
    finally:
        sys.argv = argv
    psnr = model.metric_results['psnr']
    assert abs(psnr - 30.2468) <= 0.01, f'Set5 PSNR {psnr:.4f} != 30.2468 +- 0.01'
