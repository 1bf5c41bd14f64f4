"""RS (remote sensing) stack tests: registered loss, align archs, L2S
datasets + models, SRRS CSV validation."""

import json
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basicsr4rs_tpu.models import build_model
from basicsr4rs_tpu.utils.options import yaml_load


def test_lanczos_kernel_properties():
    from basicsr4rs_tpu.losses.align_loss import lanczos_kernel
    # zero shift -> near-delta kernel (sums ~1, peak at center)
    k = lanczos_kernel(np.array([[0.0]]))
    assert abs(k.sum() - 1.0) < 1e-2
    assert k.argmax() == k.shape[1] // 2


def test_registered_loss_finds_shift():
    """A shifted copy should achieve near-zero loss; an unshifted L1 would not."""
    from basicsr4rs_tpu.losses.align_loss import RegisteredLoss
    rng = np.random.RandomState(0)
    base = rng.rand(1, 24, 24, 2).astype(np.float32)
    shifted = np.roll(base, 2, axis=2)  # shift right by 2px

    loss = RegisteredLoss(start=-3, end=3, step=1, loss_func='l1')
    reg = float(loss(jnp.asarray(base), jnp.asarray(shifted)))
    plain = float(np.abs(base[:, 4:-4, 4:-4] - shifted[:, 4:-4, 4:-4]).mean())
    assert reg < plain * 0.35, (reg, plain)


def test_encoder_loss():
    from basicsr4rs_tpu.losses.align_loss import EncoderLoss
    z = jnp.ones((1, 12, 12, 3))
    gt = jnp.zeros((1, 12, 12, 3))
    lq = jnp.zeros((1, 4, 4, 3))
    assert float(EncoderLoss(strategy='gt')(z, gt, lq)) == pytest.approx(1.0)
    assert float(EncoderLoss(strategy='lq')(z, gt, lq)) == pytest.approx(1.0)
    with pytest.raises(ValueError):
        EncoderLoss(strategy='nope')


def test_align_autoencoder_arch():
    from basicsr4rs_tpu.archs.alignae_arch import AlignAutoencoder, LREncoder
    net = AlignAutoencoder(num_in_ch=12, num_out_ch=6, num_feat=8, num_block=1)
    x = jnp.zeros((1, 16, 16, 12))
    params = net.init(jax.random.PRNGKey(0), x)['params']
    out = net.apply({'params': params}, x)
    # reference 1x1-conv-with-padding quirk grows each AlignNet output by 2
    assert out['stage1'].shape == (1, 18, 18, 6)
    assert out['stage2'].shape == (1, 20, 20, 6)
    enc = LREncoder(num_in_ch=6, num_out_ch=6, num_feat=8, num_block=1)
    p2 = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 6)))['params']
    assert enc.apply({'params': p2}, jnp.zeros((1, 8, 8, 6))).shape == (1, 10, 10, 6)


@pytest.fixture(scope='module')
def l2s_root(tmp_path_factory):
    """Synthetic L2S tree: tile/window/time with per-band tiffs + metric json."""
    root = tmp_path_factory.mktemp('l2s')
    rng = np.random.RandomState(0)
    rgb_bands = ['red.tif', 'green.tif', 'blue.tif']
    nss_bands = ['nir08.tif', 'swir16.tif', 'swir22.tif']
    metrics = {}
    for window in ['w0', 'w1']:
        metrics[window] = {'t0': {'psnr': 30.0, 'ssim': 0.9}}
        for t in ['t0']:
            base = str(root / 'tileA' / window / t)
            # landsat 30m: rgb 24x24, nss 24x24 (nss is half-res of sentinel nss grid)
            for src, rgb_size, nss_size, scale in [('landsat', 24, 24, 20000),
                                                   ('sentinel', 72, 36, 2900),
                                                   ('sentinel_hm', 72, 36, 2900)]:
                for b in rgb_bands:
                    os.makedirs(f'{base}/{src}', exist_ok=True)
                    arr = (rng.rand(rgb_size, rgb_size) * scale).astype(np.uint16)
                    cv2.imwrite(f'{base}/{src}/{b}', arr)
                for b in nss_bands:
                    arr = (rng.rand(nss_size, nss_size) * scale).astype(np.uint16)
                    cv2.imwrite(f'{base}/{src}/{b}', arr)
    with open(root / 'tileA' / 'metric.json', 'w') as f:
        json.dump(metrics, f)
    with open(root / 'tileA' / 'metric_hm.json', 'w') as f:
        json.dump(metrics, f)
    return root


def _l2s_opt(l2s_root, phase='train'):
    return {'name': 'L2S', 'type': 'L2SSingleDataset', 'phase': phase, 'scale': 3,
            'root_path': str(l2s_root), 'psnr_min': 20, 'ssim_min': 0.5, 'psnr_max': 50,
            'gt_size': 36, 'use_hflip': True, 'use_rot': False, 'manual_seed': 0}


def test_l2s_dataset(l2s_root):
    from basicsr4rs_tpu.data import build_dataset
    ds = build_dataset(_l2s_opt(l2s_root))
    assert len(ds) == 2
    item = ds[0]
    assert item['lq']['rgb'].shape == (12, 12, 3)     # gt_size/scale
    assert item['lq']['nss'].shape == (12, 12, 3)
    assert item['gt']['rgb'].shape == (36, 36, 3)
    assert item['gt']['nss'].shape == (18, 18, 3)     # nss at half the rgb grid
    assert -1.01 <= item['gt']['rgb'].min() and item['gt']['rgb'].max() <= 1.01
    assert 'tileA' in item['img_name']

    # filtering: impossible thresholds leave nothing
    opt = _l2s_opt(l2s_root)
    opt['psnr_min'] = 90
    assert len(build_dataset(opt)) == 0

    # split wrapper
    opt = _l2s_opt(l2s_root)
    opt.update(type='L2SSingleSplitDataset', split_percent=[0.5, 0.5], split=0)
    ds0 = build_dataset(opt)
    assert len(ds0) == 1

    # HM variant reads sentinel_hm
    opt = _l2s_opt(l2s_root)
    opt['type'] = 'L2SSingleHMDataset'
    item_hm = build_dataset(opt)[0]
    assert item_hm['gt']['rgb'].shape == (36, 36, 3)

    # mean2std variant
    opt = _l2s_opt(l2s_root)
    opt['type'] = 'L2SSingleMean2StdDataset'
    item_m = build_dataset(opt)[0]
    assert abs(item_m['gt']['rgb']).max() <= 1.0 + 1e-5


def test_l2s_model_train_and_validation(l2s_root, tmp_path):
    from basicsr4rs_tpu.data import build_dataset, build_dataloader
    opt = yaml_load(f"""
name: test_l2s
model_type: L2SSingleModel
scale: 3
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {{type: SRCNN, num_in_ch: 6, num_out_ch: 6, upscale: 3}}
path: {{pretrain_network_g: ~}}
train:
  ema_decay: 0
  use_amp: false
  optim_g: {{type: Adam, lr: !!float 1e-3}}
  scheduler: {{type: ConstantLR}}
  total_iter: 10
  pixel_opt: {{type: L1Loss, loss_weight: 1.0}}
val:
  val_freq: 10
  save_img: true
  metrics:
    psnr_b0: {{type: calculate_psnr_band, crop_border: 3, band: 0}}
    ssim_b0: {{type: calculate_ssim_band, crop_border: 3, band: 0}}
""")
    opt['path']['visualization'] = str(tmp_path / 'vis')
    model = build_model(opt)

    ds = build_dataset(_l2s_opt(l2s_root))
    loader = build_dataloader(ds, {**_l2s_opt(l2s_root), 'batch_size_per_gpu': 2,
                                   'num_worker_per_gpu': 0}, num_gpu=1)
    batch = next(iter(loader))
    model.feed_data(batch)
    assert model.batch['lq'].shape == (2, 12, 12, 6)
    assert model.batch['gt'].shape == (2, 36, 36, 6)
    model.optimize_parameters(1)
    assert np.isfinite(model.get_current_log()['l_pix'])

    # validation: CSV + RGB/NSS visuals
    val_loader = build_dataloader(build_dataset(_l2s_opt(l2s_root, 'val')),
                                  _l2s_opt(l2s_root, 'val'), num_gpu=1)
    model.nondist_validation(val_loader, 10, None, save_img=True)
    assert 'psnr_b0' in model.metric_results
    csvs = [f for f in os.listdir(opt['path']['visualization']) if f.endswith('.csv')]
    assert csvs, 'per-image metric CSV not written'
    assert os.path.isdir(os.path.join(opt['path']['visualization'], 'RGB'))
    assert os.path.isdir(os.path.join(opt['path']['visualization'], 'NSS'))


def test_align_single_model(l2s_root, tmp_path):
    from basicsr4rs_tpu.data import build_dataset, build_dataloader
    opt = yaml_load("""
name: test_align
model_type: AlignSingleModel
scale: 3
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {type: AlignAutoencoder, num_in_ch: 12, num_out_ch: 6, num_feat: 8, num_block: 1}
path: {pretrain_network_g: ~}
train:
  ema_decay: 0
  use_amp: false
  optim_g: {type: Adam, lr: !!float 1e-3}
  scheduler: {type: ConstantLR}
  total_iter: 10
  stage1_opt: {type: EncoderLoss, strategy: gt, loss_weight: 1.0}
  stage2_opt: {type: RegisteredLoss, start: -2, end: 2, step: 1, loss_func: l1, loss_weight: 1.0}
val:
  val_freq: 10
  metrics:
    psnr_b0: {type: calculate_psnr_band, crop_border: 3, band: 0}
""")
    opt['path']['visualization'] = str(tmp_path / 'vis')
    model = build_model(opt)
    ds = build_dataset(_l2s_opt(l2s_root))
    loader = build_dataloader(ds, {**_l2s_opt(l2s_root), 'batch_size_per_gpu': 2,
                                   'num_worker_per_gpu': 0}, num_gpu=1)
    model.feed_data(next(iter(loader)))
    model.optimize_parameters(1)
    logs = model.get_current_log()
    assert np.isfinite(logs['stage1_loss']) and np.isfinite(logs['stage2_loss'])
    model.test()
    assert model.output.shape == model.batch['gt'].shape
