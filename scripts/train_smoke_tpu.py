"""End-to-end training smoke on the accelerator: real train_pipeline CLI
path, synthetic bicubic SR data, N iterations, asserts the loss drops and
validation PSNR beats bicubic-ish baselines.

Builds a disk dataset of structured synthetic images (smooth gradients +
edges + texture), LR = MATLAB-bicubic x4 downscale (the reference's data
protocol, utils/matlab_functions.py), writes a debug YAML, then drives
``basicsr4rs_tpu.train.train_pipeline`` exactly as the CLI does — loaders,
EnlargedSampler, prefetcher, jitted train step, EMA, LR schedule, logging,
checkpoint save, validation with PSNR/SSIM, resume state.

Prints one JSON line with first/last train loss and final val PSNR.

Usage: python scripts/train_smoke_tpu.py [--iters 300] [--arch msrresnet]
"""

import argparse
import json
import re
import shutil
import sys
import tempfile
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def make_images(root, n, size, rng):
    import cv2
    from basicsr4rs_tpu.utils.matlab_functions import imresize
    gt_dir = osp.join(root, 'gt')
    lq_dir = osp.join(root, 'lq')
    for d in (gt_dir, lq_dir):
        import os
        os.makedirs(d, exist_ok=True)
    for i in range(n):
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        img = np.stack([
            0.5 + 0.5 * np.sin(2 * np.pi * (yy * rng.uniform(1, 4) + rng.rand())),
            0.5 + 0.5 * np.cos(2 * np.pi * (xx * rng.uniform(1, 4) + rng.rand())),
            np.clip(yy * rng.rand() + xx * rng.rand(), 0, 1),
        ], -1)
        # hard edges + blobs so x4 SR has real high-frequency content
        for _ in range(12):
            cy, cx = rng.randint(0, size, 2)
            r = rng.randint(4, size // 4)
            col = rng.rand(3)
            cv2.circle(img, (cx, cy), r, col.tolist(), -1)
        for _ in range(8):
            p1 = tuple(rng.randint(0, size, 2))
            p2 = tuple(rng.randint(0, size, 2))
            cv2.line(img, p1, p2, rng.rand(3).tolist(), rng.randint(1, 4))
        img8 = (img * 255).round().astype(np.uint8)
        lr = imresize(img8.astype(np.float32) / 255., 0.25)
        lr8 = (np.clip(lr, 0, 1) * 255).round().astype(np.uint8)
        cv2.imwrite(osp.join(gt_dir, f'{i:03d}.png'), img8[..., ::-1])
        cv2.imwrite(osp.join(lq_dir, f'{i:03d}.png'), lr8[..., ::-1])
    return gt_dir, lq_dir


ARCHS = {
    'msrresnet': ('{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, '
                  'num_feat: 64, num_block: 16, upscale: 4}'),
    'swinir': ('{type: SwinIR, upscale: 4, in_chans: 3, img_size: 32, '
               'window_size: 8, img_range: 1., depths: [4, 4], embed_dim: 60, '
               'num_heads: [6, 6], mlp_ratio: 2, upsampler: pixelshuffledirect}'),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=300)
    p.add_argument('--arch', default='msrresnet', choices=sorted(ARCHS))
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--gt-size', type=int, default=128)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    root = tempfile.mkdtemp(prefix='train_smoke_')
    try:
        gt_dir, lq_dir = make_images(root, 32, 256, rng)
        exp_root = osp.join(root, 'experiments')
        yml = osp.join(root, 'smoke.yml')
        with open(yml, 'w') as f:
            f.write(f"""
name: debug_train_smoke_{args.arch}
model_type: SRModel
scale: 4
num_gpu: 1
manual_seed: 0
datasets:
  train:
    name: synth
    type: PairedImageDataset
    dataroot_gt: {gt_dir}
    dataroot_lq: {lq_dir}
    io_backend: {{type: disk}}
    gt_size: {args.gt_size}
    use_hflip: true
    use_rot: true
    num_worker_per_gpu: 4
    batch_size_per_gpu: {args.batch}
    dataset_enlarge_ratio: 10
    prefetch_mode: device
  val:
    name: synthval
    type: PairedImageDataset
    dataroot_gt: {gt_dir}
    dataroot_lq: {lq_dir}
    io_backend: {{type: disk}}
network_g: {ARCHS[args.arch]}
path:
  pretrain_network_g: ~
  strict_load_g: true
  resume_state: ~
  experiments_root: {exp_root}
train:
  # validation evaluates params_ema; at the production 0.999 decay a
  # few-hundred-iter smoke would still be ~init (0.999^300 = 0.74)
  ema_decay: 0.99
  optim_g: {{type: Adam, lr: !!float 2e-4, betas: [0.9, 0.99]}}
  scheduler: {{type: CosineAnnealingRestartLR, periods: [{args.iters}], restart_weights: [1], eta_min: !!float 1e-7}}
  total_iter: {args.iters}
  warmup_iter: -1
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
val:
  val_freq: {args.iters}
  save_img: false
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 4}}
    ssim: {{type: calculate_ssim, crop_border: 4}}
logger:
  print_freq: 50
  save_checkpoint_freq: {args.iters}
  use_tb_logger: false
""")
        from basicsr4rs_tpu.train import train_pipeline
        import logging

        records = {'losses': [], 'psnr': None, 'ssim': None}

        class Capture(logging.Handler):
            def emit(self, rec):
                msg = rec.getMessage()
                m = re.search(r'l_pix:\s*([0-9.eE+-]+)', msg)
                if m:
                    records['losses'].append(float(m.group(1)))
                m = re.search(r'psnr:\s*([0-9.]+)', msg)
                if m:
                    records['psnr'] = float(m.group(1))
                m = re.search(r'ssim:\s*([0-9.]+)', msg)
                if m:
                    records['ssim'] = float(m.group(1))

        logging.getLogger('basicsr4rs_tpu').addHandler(Capture())
        sys.argv = ['train.py', '-opt', yml]
        train_pipeline(root)

        import jax
        first, last = records['losses'][0], records['losses'][-1]
        # first logged loss is at iter print_freq, already past the
        # steep initial descent -- require continued decrease + a PSNR
        # floor consistent with the arch at smoke length (MSRResNet has a
        # bilinear input skip so it starts high; SwinIR trains from scratch
        # with no skip and reaches ~18 dB at 300 iters)
        floor = {'msrresnet': 21.0, 'swinir': 16.0}[args.arch]
        ok = last < first * 0.97 and (records['psnr'] or 0) > floor
        print(json.dumps({
            'metric': 'train_smoke', 'value': records['psnr'],
            'unit': 'dB val PSNR', 'arch': args.arch, 'iters': args.iters,
            'first_l_pix': first, 'last_l_pix': last,
            'val_psnr': records['psnr'], 'val_ssim': records['ssim'],
            'loss_dropped': last < first * 0.97, 'ok': ok,
            'platform': jax.default_backend(),
        }))
        if not ok:
            raise SystemExit(1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == '__main__':
    main()
