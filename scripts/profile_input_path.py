"""Profile the Real-ESRGAN training input path (VERDICT r1 item 10).

The framework's claim is that the two-stage degradation synthesis — per-item
CPU work in the reference (realesrgan_model.py:68-185 runs on GPU but the
kernel/image IO is per-item CPU) — lives on-device inside one jitted program,
so the host loader only decodes PNGs and samples 21x21 kernels. This script
quantifies that with three regimes over the SAME model/batch shapes:

  A. compute-only   — one pre-made device batch, jitted train step in a loop
                      (upper bound: zero input cost)
  B. synth+compute  — fixed host batch, full jitted synthesis + train step
                      (adds the on-device degradation program + H2D)
  C. full pipeline  — real RealESRGANDataset (synthetic PNGs) + DataLoader
                      workers + device prefetcher, as basicsr4rs_tpu.train runs it

Reported: step time per regime, synthesis cost (B-A), data stall (C-B),
stall fraction (1 - B/C). Optionally captures an xprof trace of regime C
(--trace DIR). Prints one JSON line.

axon-TPU note: only host fetches force execution, so each timed window ends
with a jax.block_until_ready + a scalar fetch.

Usage:
    python scripts/profile_input_path.py [--steps 30] [--batch 12]
        [--gt-size 256] [--workers 4] [--trace /tmp/xprof]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


DATASET_OPT = {
    # kernel-synthesis settings from options/train/RealESRGAN/train_realesrnet_x4plus.yml
    'name': 'profile', 'type': 'RealESRGANDataset', 'phase': 'train', 'scale': 4,
    'io_backend': {'type': 'disk'},
    'blur_kernel_size': 21,
    'kernel_list': ['iso', 'aniso', 'generalized_iso', 'generalized_aniso',
                    'plateau_iso', 'plateau_aniso'],
    'kernel_prob': [0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
    'sinc_prob': 0.1, 'blur_sigma': [0.2, 3], 'betag_range': [0.5, 4],
    'betap_range': [1, 2],
    'blur_kernel_size2': 21,
    'kernel_list2': ['iso', 'aniso', 'generalized_iso', 'generalized_aniso',
                     'plateau_iso', 'plateau_aniso'],
    'kernel_prob2': [0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
    'sinc_prob2': 0.1, 'blur_sigma2': [0.2, 1.5], 'betag_range2': [0.5, 4],
    'betap_range2': [1, 2],
    'final_sinc_prob': 0.8,
    'use_hflip': True, 'use_rot': False,
    'dataset_enlarge_ratio': 1, 'manual_seed': 0,
}


ARCHS = {
    # the reference RealESRNet generator (train_realesrnet_x4plus.yml)
    'rrdb': ('{type: RRDBNet, num_in_ch: 3, num_out_ch: 3, num_feat: 64, '
             'num_block: 23, num_grow_ch: 32}'),
    # lighter net = harsher input-path stress test
    'msrresnet': ('{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, '
                  'num_feat: 64, num_block: 16, upscale: 4}'),
}


def make_model(batch, gt_size, arch='rrdb'):
    from basicsr4rs_tpu.models import build_model
    from basicsr4rs_tpu.utils.options import yaml_load
    opt = yaml_load(f"""
name: profile_input_path
model_type: RealESRNetModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
gt_size: {gt_size}
queue_size: {max(batch * 6, 60) // batch * batch}
gt_usm: true
high_order_degradation: true
# degradation-stage settings from train_realesrnet_x4plus.yml
resize_prob: [0.2, 0.7, 0.1]
resize_range: [0.15, 1.5]
gaussian_noise_prob: 0.5
noise_range: [1, 30]
poisson_scale_range: [0.05, 3]
gray_noise_prob: 0.4
jpeg_range: [30, 95]
second_blur_prob: 0.8
resize_prob2: [0.3, 0.4, 0.3]
resize_range2: [0.3, 1.2]
gaussian_noise_prob2: 0.5
noise_range2: [1, 25]
poisson_scale_range2: [0.05, 2.5]
gray_noise_prob2: 0.4
jpeg_range2: [30, 95]
network_g: {ARCHS[arch]}
path: {{pretrain_network_g: ~}}
train:
  ema_decay: 0.999
  optim_g: {{type: Adam, lr: !!float 2e-4}}
  scheduler: {{type: ConstantLR}}
  total_iter: 1000000
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
val: {{val_freq: !!float 1e8, metrics: {{psnr: {{type: calculate_psnr, crop_border: 4}}}}}}
""")
    # the degrader reads its probabilities from opt (same keys as dataset)
    opt.update({k: v for k, v in DATASET_OPT.items()
                if k not in ('name', 'type', 'phase', 'io_backend')})
    return build_model(opt)


def sync(model):
    import jax
    jax.block_until_ready(model.state.params)
    return float(np.asarray(model.get_current_log()['l_pix']))


def timed_steps(model, next_batch, steps, warmup=3):
    """next_batch() -> host batch dict; returns seconds/step."""
    for _ in range(warmup):
        model.feed_data(next_batch())
        model.optimize_parameters(1)
    sync(model)
    t0 = time.perf_counter()
    for _ in range(steps):
        model.feed_data(next_batch())
        model.optimize_parameters(1)
    sync(model)
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=30)
    p.add_argument('--batch', type=int, default=12)
    p.add_argument('--gt-size', type=int, default=256)
    p.add_argument('--workers', type=int, default=4)
    p.add_argument('--num-images', type=int, default=48)
    p.add_argument('--arch', default='rrdb', choices=sorted(ARCHS))
    p.add_argument('--trace', default=None, help='xprof trace dir for regime C')
    args = p.parse_args()

    import cv2
    import jax

    from basicsr4rs_tpu.data import build_dataloader, build_dataset
    from basicsr4rs_tpu.data.loader import DevicePrefetcher

    model = make_model(args.batch, args.gt_size, args.arch)

    # ---- regime A: compute-only (batch already synthesized, on device)
    rng = np.random.RandomState(0)
    gt_np = rng.rand(args.batch, args.gt_size + 144, args.gt_size + 144, 3).astype(np.float32)
    kernels = {
        'kernel1': np.tile(np.eye(21, dtype=np.float32)[None] / 21, (args.batch, 1, 1)),
        'kernel2': np.tile(np.eye(21, dtype=np.float32)[None] / 21, (args.batch, 1, 1)),
        'sinc_kernel': np.tile(np.eye(21, dtype=np.float32)[None] / 21, (args.batch, 1, 1)),
    }
    model.feed_data({'gt': gt_np, **kernels})  # synthesize once
    fixed_device_batch = dict(model.batch)

    def next_fixed_device():
        return fixed_device_batch

    orig_feed = model.feed_data
    model.feed_data = lambda b: setattr(model, 'batch', b)  # bypass synthesis
    t_a = timed_steps(model, next_fixed_device, args.steps)
    model.feed_data = orig_feed

    # ---- regime B: on-device synthesis + step, host batch fixed
    host_batch = {'gt': gt_np, **kernels}
    t_b = timed_steps(model, lambda: host_batch, args.steps)

    # decompose regime B: H2D transfer vs the synthesis program itself
    import jax.numpy as jnp
    dev_inputs = {k: jnp.asarray(v) for k, v in host_batch.items()}

    def h2d_only():
        out = {k: jnp.asarray(v) for k, v in host_batch.items()}
        jax.block_until_ready(out)
        np.asarray(out['gt']).ravel()[:1]
        return out

    t0 = time.perf_counter()
    for _ in range(args.steps):
        h2d_only()
    t_h2d = (time.perf_counter() - t0) / args.steps

    def synth_only():
        key = jax.random.PRNGKey(0)
        return model._synth_fn(key, model.pool_state, dev_inputs['gt'],
                               dev_inputs['kernel1'], dev_inputs['kernel2'],
                               dev_inputs['sinc_kernel'])

    for _ in range(3):
        out = synth_only()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = synth_only()
    jax.block_until_ready(out)
    np.asarray(out[1]).ravel()[:1]
    t_synth = (time.perf_counter() - t0) / args.steps

    # ---- regime C: full pipeline with real dataset + loader + prefetcher
    tmp = tempfile.mkdtemp(prefix='profile_input_')
    try:
        for i in range(args.num_images):
            img = (rng.rand(args.gt_size + 144, args.gt_size + 144, 3) * 255).astype(np.uint8)
            cv2.imwrite(osp.join(tmp, f'{i:04d}.png'), img)
        ds_opt = dict(DATASET_OPT)
        ds_opt.update({'dataroot_gt': tmp, 'gt_size': args.gt_size,
                       'batch_size_per_gpu': args.batch,
                       'num_worker_per_gpu': args.workers})
        dataset = build_dataset(ds_opt)
        loader = build_dataloader(dataset, ds_opt, num_gpu=1)
        prefetcher = DevicePrefetcher(loader, lambda b: b)  # host batches; synthesis is feed_data

        def next_loaded():
            b = prefetcher.next()
            if b is None:
                prefetcher.reset()
                b = prefetcher.next()
            return b

        if args.trace:
            jax.profiler.start_trace(args.trace)
        t_c = timed_steps(model, next_loaded, args.steps)
        if args.trace:
            jax.profiler.stop_trace()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # per-call dispatch floor (large on the remote axon tunnel; ~0.1 ms on a
    # local TPU host) — contextualizes the per-step numbers above
    tiny = jax.jit(lambda v: v + 1.0)
    v = jnp.zeros((8, 128), jnp.float32)
    for _ in range(3):
        v = tiny(v)
    jax.block_until_ready(v)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        v = tiny(v)
    jax.block_until_ready(v)
    np.asarray(v).ravel()[:1]
    t_dispatch = (time.perf_counter() - t0) / args.steps

    out_mpix = args.batch * args.gt_size * args.gt_size / 1e6
    result = {
        'metric': 'realesrnet_train_step_ms',
        'value': round(t_c * 1e3, 2),
        'unit': 'ms/step',
        'batch': args.batch, 'gt_size': args.gt_size, 'arch': args.arch,
        'compute_only_ms': round(t_a * 1e3, 2),
        'synth_compute_ms': round(t_b * 1e3, 2),
        'full_pipeline_ms': round(t_c * 1e3, 2),
        'synthesis_cost_ms': round((t_b - t_a) * 1e3, 2),
        'h2d_only_ms': round(t_h2d * 1e3, 2),
        'synth_program_ms': round(t_synth * 1e3, 2),
        'data_stall_ms': round((t_c - t_b) * 1e3, 2),
        'data_stall_fraction': round(max(0.0, 1 - t_b / t_c), 4),
        'dispatch_floor_ms': round(t_dispatch * 1e3, 3),
        'train_mpix_s': round(out_mpix / t_c, 2),
        'platform': jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
