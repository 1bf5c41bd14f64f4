"""Mid-scale convergence anchor: SAME recipe, SAME corpus, SAME init —
JAX (this framework, optionally on chip) vs the torch reference on CPU,
trained to convergence and compared on final val PSNR (VERDICT r5 #4).

This upgrades the 50-step trajectory-parity pins to "training converges to
the same place": both sides start from the IDENTICAL torch-initialized
weights (converted via utils/torch_convert), consume the IDENTICAL batch
sequence (same images, same crop positions, precomputed host-side), run the
IDENTICAL recipe (Adam lr/betas, L1, fixed LR, no EMA), and are scored with
the SAME PSNR metric on a held-out synthetic val split. DIV2K is not
available in this environment; the corpus is the deterministic synthetic
bicubic protocol of scripts/train_smoke_tpu.py (structured images, MATLAB
bicubic x4 LR — reference data protocol, basicsr/data/*paired* +
utils/matlab_functions.py; training protocol anchor:
/root/reference/basicsr/train.py:92 + docs/ModelZoo.md MSRResNet row).

The JAX side runs through the REAL model class (SRModel: jitted step,
optimizer wiring, loss reduction) — the model lifecycle is the thing under
test, exactly as in tests/test_pipelines/test_train_parity.py.

Prints one JSON line:
  {"psnr_jax": ..., "psnr_torch": ..., "delta_db": ..., "iters": N, ...}

Usage:
    python scripts/convergence_anchor.py [--iters 3000] [--feat 16]
        [--blocks 4] [--batch 8] [--lr-crop 16] [--skip-torch]
"""

import argparse
import json
import sys
import time
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(REPO, 'tests'))

SCALE = 4


def make_corpus(n_train=40, n_val=8, size=96, seed=0):
    """Deterministic structured synthetic corpus; LR = MATLAB bicubic x4
    (quantized to uint8 like the on-disk protocol, then back to float32) —
    both frameworks consume these exact arrays."""
    import cv2
    from basicsr4rs_tpu.utils.matlab_functions import imresize
    rng = np.random.RandomState(seed)
    gts, lqs = [], []
    for _ in range(n_train + n_val):
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        img = np.stack([
            0.5 + 0.5 * np.sin(2 * np.pi * (yy * rng.uniform(1, 4) + rng.rand())),
            0.5 + 0.5 * np.cos(2 * np.pi * (xx * rng.uniform(1, 4) + rng.rand())),
            np.clip(yy * rng.rand() + xx * rng.rand(), 0, 1),
        ], -1)
        for _ in range(12):
            cy, cx = rng.randint(0, size, 2)
            r = rng.randint(4, size // 4)
            cv2.circle(img, (int(cx), int(cy)), int(r), rng.rand(3).tolist(), -1)
        for _ in range(8):
            p1 = tuple(int(v) for v in rng.randint(0, size, 2))
            p2 = tuple(int(v) for v in rng.randint(0, size, 2))
            cv2.line(img, p1, p2, rng.rand(3).tolist(), int(rng.randint(1, 4)))
        img8 = (np.clip(img, 0, 1) * 255).round().astype(np.uint8)
        gt = img8.astype(np.float32) / 255.
        lr = imresize(gt, 1. / SCALE)
        lr8 = (np.clip(lr, 0, 1) * 255).round().astype(np.uint8)
        gts.append(gt)
        lqs.append(lr8.astype(np.float32) / 255.)
    return (gts[:n_train], lqs[:n_train]), (gts[n_train:], lqs[n_train:])


def batch_schedule(n_iters, n_imgs, lr_size, lr_crop, batch, seed=1):
    """Precomputed (img_idx, y, x) per sample per step — identical batch
    sequence for both frameworks."""
    rng = np.random.RandomState(seed)
    sched = []
    for _ in range(n_iters):
        idx = rng.randint(0, n_imgs, batch)
        ys = rng.randint(0, lr_size - lr_crop + 1, batch)
        xs = rng.randint(0, lr_size - lr_crop + 1, batch)
        sched.append((idx, ys, xs))
    return sched


def crops(train, sched_entry, lr_crop):
    gts, lqs = train
    idx, ys, xs = sched_entry
    lq = np.stack([lqs[i][y:y + lr_crop, x:x + lr_crop]
                   for i, y, x in zip(idx, ys, xs)])
    gt = np.stack([gts[i][y * SCALE:(y + lr_crop) * SCALE,
                          x * SCALE:(x + lr_crop) * SCALE]
                   for i, y, x in zip(idx, ys, xs)])
    return lq.astype(np.float32), gt.astype(np.float32)


def psnr_of(sr, gt):
    from basicsr4rs_tpu.metrics.psnr_ssim import calculate_psnr
    sr8 = (np.clip(sr, 0, 1) * 255).round().astype(np.uint8)
    gt8 = (np.clip(gt, 0, 1) * 255).round().astype(np.uint8)
    return calculate_psnr(sr8, gt8, crop_border=SCALE)


def run_jax(init_params, train, val, sched, args):
    import jax
    from basicsr4rs_tpu.models import build_model
    from basicsr4rs_tpu.utils.options import yaml_load
    opt = yaml_load(f"""
name: convergence_anchor
model_type: SRModel
scale: {SCALE}
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {{type: MSRResNet, num_in_ch: 3, num_out_ch: 3,
  num_feat: {args.feat}, num_block: {args.blocks}, upscale: {SCALE}}}
path: {{pretrain_network_g: ~}}
train:
  ema_decay: 0
  optim_g: {{type: Adam, lr: !!float {args.lr}, betas: [0.9, 0.99]}}
  scheduler: {{type: ConstantLR}}
  total_iter: {args.iters}
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
val: {{val_freq: {args.iters}}}
""")
    model = build_model(opt)
    model.params = init_params
    model.setup_optimizers()
    t0 = time.time()
    first = last = None
    for it, entry in enumerate(sched):
        lq, gt = crops(train, entry, args.lr_crop)
        model.feed_data({'lq': lq, 'gt': gt})
        model.optimize_parameters(it + 1)
        if it == 0:
            first = float(model.get_current_log()['l_pix'])
    last = float(model.get_current_log()['l_pix'])
    dt = time.time() - t0

    # full-frame val on the TRAINED params (ema off -> state.params)
    fwd = jax.jit(lambda p, x: model.net_g.apply({'params': p}, x))
    trained = model.state.params
    psnrs = []
    for gt, lq in zip(*val):
        sr = np.asarray(fwd(trained, lq[None]))[0]
        psnrs.append(psnr_of(sr, gt))
    return float(np.mean(psnrs)), first, last, dt


def run_torch(train, val, sched, args):
    import torch
    from ref_loader import load_ref_module
    ref_mod = load_ref_module('basicsr/archs/srresnet_arch.py')
    torch.manual_seed(0)
    net = ref_mod.MSRResNet(num_in_ch=3, num_out_ch=3, num_feat=args.feat,
                            num_block=args.blocks, upscale=SCALE)
    init_sd = {k: v.detach().clone() for k, v in net.state_dict().items()}
    net.train()
    opt_t = torch.optim.Adam(net.parameters(), lr=args.lr, betas=(0.9, 0.99))
    crit = torch.nn.L1Loss()
    t0 = time.time()
    first = last = None
    for it, entry in enumerate(sched):
        lq, gt = crops(train, entry, args.lr_crop)
        lq_t = torch.from_numpy(np.ascontiguousarray(lq.transpose(0, 3, 1, 2)))
        gt_t = torch.from_numpy(np.ascontiguousarray(gt.transpose(0, 3, 1, 2)))
        opt_t.zero_grad()
        loss = crit(net(lq_t), gt_t)
        loss.backward()
        opt_t.step()
        if it == 0:
            first = float(loss.detach())
    last = float(loss.detach())
    dt = time.time() - t0

    net.eval()
    psnrs = []
    with torch.no_grad():
        for gt, lq in zip(*val):
            x = torch.from_numpy(np.ascontiguousarray(
                lq.transpose(2, 0, 1)))[None]
            sr = net(x)[0].numpy().transpose(1, 2, 0)
            psnrs.append(psnr_of(sr, gt))
    return float(np.mean(psnrs)), first, last, dt, init_sd


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=3000)
    p.add_argument('--feat', type=int, default=16)
    p.add_argument('--blocks', type=int, default=4)
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--lr-crop', type=int, default=16)
    p.add_argument('--lr', type=float, default=2e-4)
    p.add_argument('--tol-db', type=float, default=0.2,
                   help='max |psnr_jax - psnr_torch| to call it converged-equal')
    p.add_argument('--skip-torch', action='store_true',
                   help='JAX side only (e.g. re-run on chip)')
    args = p.parse_args()

    from basicsr4rs_tpu.utils.torch_convert import convert_torch_state_dict

    train, val = make_corpus()
    sched = batch_schedule(args.iters, len(train[0]),
                           train[1][0].shape[0], args.lr_crop, args.batch)

    out = {'metric': 'convergence_anchor_delta_db', 'iters': args.iters,
           'feat': args.feat, 'blocks': args.blocks, 'batch': args.batch}
    if not args.skip_torch:
        psnr_t, tf, tl, tdt, init_sd = run_torch(train, val, sched, args)
        out.update(psnr_torch=round(psnr_t, 4), torch_loss_first=round(tf, 5),
                   torch_loss_last=round(tl, 5), torch_s=round(tdt, 1))
        init_params = convert_torch_state_dict(init_sd)
    else:
        import torch
        from ref_loader import load_ref_module
        ref_mod = load_ref_module('basicsr/archs/srresnet_arch.py')
        torch.manual_seed(0)
        net = ref_mod.MSRResNet(num_in_ch=3, num_out_ch=3, num_feat=args.feat,
                                num_block=args.blocks, upscale=SCALE)
        init_params = convert_torch_state_dict(net.state_dict())

    psnr_j, jf, jl, jdt = run_jax(init_params, train, val, sched, args)
    out.update(psnr_jax=round(psnr_j, 4), jax_loss_first=round(jf, 5),
               jax_loss_last=round(jl, 5), jax_s=round(jdt, 1))
    if 'psnr_torch' in out:
        out['value'] = out['delta_db'] = round(psnr_j - out['psnr_torch'], 4)
        out['converged_equal'] = bool(abs(out['delta_db']) <= args.tol_db)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
