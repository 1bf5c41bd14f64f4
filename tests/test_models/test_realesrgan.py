"""Real-ESRGAN synthesis pipeline + model tests."""

import cv2
import numpy as np
import pytest

from basicsr4rs_tpu.models import build_model
from basicsr4rs_tpu.utils.options import yaml_load

DEGRADATION_YML = """
scale: 4
gt_size: 64
queue_size: 8
gt_usm: true
l1_gt_usm: true
percep_gt_usm: true
gan_gt_usm: false
high_order_degradation: true
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
"""


def _kernels(n):
    from basicsr4rs_tpu.data.degradations import bivariate_Gaussian, circular_lowpass_kernel
    k1 = np.stack([bivariate_Gaussian(21, 2.0, 2.0, 0).astype(np.float32)] * n)
    k2 = np.stack([bivariate_Gaussian(21, 1.0, 1.0, 0).astype(np.float32)] * n)
    sinc = np.stack([circular_lowpass_kernel(np.pi / 2, 13, pad_to=21).astype(np.float32)] * n)
    return k1, k2, sinc


def test_degrader_shapes_and_range():
    import jax
    import jax.numpy as jnp
    from basicsr4rs_tpu.ops.degradation_pipeline import RealESRGANDegrader
    opt = yaml_load(DEGRADATION_YML)
    deg = RealESRGANDegrader(opt)
    n, ori = 2, 128
    gt = np.random.RandomState(0).rand(n, ori, ori, 3).astype(np.float32)
    k1, k2, sinc = _kernels(n)
    lq, gt_out, gt_usm = jax.jit(deg)(jax.random.PRNGKey(0), jnp.asarray(gt),
                                      jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(sinc))
    assert lq.shape == (n, ori // 4, ori // 4, 3)
    assert gt_out.shape == gt.shape and gt_usm.shape == gt.shape
    assert 0 <= float(jnp.min(lq)) and float(jnp.max(lq)) <= 1
    # degraded LQ differs from a clean bicubic downscale
    assert float(jnp.std(lq)) > 0.01
    # different keys -> different degradations
    lq2, _, _ = jax.jit(deg)(jax.random.PRNGKey(1), jnp.asarray(gt),
                             jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(sinc))
    assert float(jnp.mean(jnp.abs(lq - lq2))) > 1e-4


def test_training_pair_pool():
    import jax
    import jax.numpy as jnp
    from basicsr4rs_tpu.ops.degradation_pipeline import TrainingPairPool
    pool = TrainingPairPool(8, (4, 4, 3), (16, 16, 3))
    state = pool.init_state()
    outs = []
    for i in range(6):
        lq = jnp.full((2, 4, 4, 3), float(i))
        gt = jnp.full((2, 16, 16, 3), float(i))
        state, lq_o, gt_o = pool.update(jax.random.PRNGKey(i), state, lq, gt)
        outs.append(float(lq_o[0, 0, 0, 0]))
    # first 4 updates fill the pool and pass batches through unchanged
    assert outs[:4] == [0., 1., 2., 3.]
    # after full, outputs are drawn from the (shuffled) pool of older batches
    assert int(state['ptr']) == 8


@pytest.fixture(scope='module')
def gt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp('gts')
    rng = np.random.RandomState(1)
    for i in range(3):
        cv2.imwrite(str(root / f'{i}.png'), (rng.rand(128, 128, 3) * 255).astype(np.uint8))
    return root


def test_realesrgan_dataset(gt_dir):
    from basicsr4rs_tpu.data import build_dataset
    opt = yaml_load(f"""
name: RealSyn
type: RealESRGANDataset
phase: train
scale: 4
dataroot_gt: {gt_dir}
io_backend: {{type: disk}}
use_hflip: true
use_rot: false
crop_pad_size: 128
blur_kernel_size: 21
kernel_list: ['iso', 'aniso', 'generalized_iso', 'generalized_aniso', 'plateau_iso', 'plateau_aniso']
kernel_prob: [0.45, 0.25, 0.12, 0.03, 0.12, 0.03]
sinc_prob: 0.1
blur_sigma: [0.2, 3]
betag_range: [0.5, 4]
betap_range: [1, 2]
blur_kernel_size2: 21
kernel_list2: ['iso', 'aniso', 'generalized_iso', 'generalized_aniso', 'plateau_iso', 'plateau_aniso']
kernel_prob2: [0.45, 0.25, 0.12, 0.03, 0.12, 0.03]
sinc_prob2: 0.1
blur_sigma2: [0.2, 1.5]
betag_range2: [0.5, 4]
betap_range2: [1, 2]
final_sinc_prob: 0.8
manual_seed: 0
""")
    ds = build_dataset(opt)
    item = ds[0]
    assert item['gt'].shape == (128, 128, 3)
    for k in ['kernel1', 'kernel2', 'sinc_kernel']:
        assert item[k].shape == (21, 21)
        np.testing.assert_allclose(item[k].sum(), 1.0, atol=1e-5)


def test_realesrnet_model_train_step(gt_dir):
    opt = yaml_load(f"""
name: test_realesrnet
model_type: RealESRNetModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
{DEGRADATION_YML}
network_g: {{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 8, num_block: 1, upscale: 4}}
path: {{pretrain_network_g: ~}}
train:
  ema_decay: 0.999
  optim_g: {{type: Adam, lr: !!float 1e-4}}
  scheduler: {{type: ConstantLR}}
  total_iter: 100
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
val:
  val_freq: 100
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 4}}
""")
    model = build_model(opt)
    rng = np.random.RandomState(0)
    k1, k2, sinc = _kernels(2)
    data = {'gt': rng.rand(2, 128, 128, 3).astype(np.float32),
            'kernel1': k1, 'kernel2': k2, 'sinc_kernel': sinc}
    model.feed_data(data)
    assert model.batch['lq'].shape == (2, 16, 16, 3)
    assert model.batch['gt'].shape == (2, 64, 64, 3)
    model.optimize_parameters(1)
    assert np.isfinite(model.get_current_log()['l_pix'])
    # second feed advances the pool
    model.feed_data(data)
    model.optimize_parameters(2)
    assert int(model.pool_state['ptr']) == 4


def test_realesrgan_gan_model_train_step():
    opt = yaml_load(f"""
name: test_realesrgan_gan
model_type: RealESRGANModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
{DEGRADATION_YML}
network_g: {{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 8, num_block: 1, upscale: 4}}
network_d: {{type: UNetDiscriminatorSN, num_in_ch: 3, num_feat: 8}}
path: {{pretrain_network_g: ~, pretrain_network_d: ~}}
train:
  ema_decay: 0.999
  net_d_iters: 1
  net_d_init_iters: 0
  optim_g: {{type: Adam, lr: !!float 1e-4}}
  optim_d: {{type: Adam, lr: !!float 1e-4}}
  scheduler: {{type: ConstantLR}}
  total_iter: 100
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
  gan_opt: {{type: GANLoss, gan_type: vanilla, loss_weight: !!float 5e-3}}
val:
  val_freq: 100
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 4}}
""")
    model = build_model(opt)
    rng = np.random.RandomState(0)
    k1, k2, sinc = _kernels(2)
    model.feed_data({'gt': rng.rand(2, 128, 128, 3).astype(np.float32),
                     'kernel1': k1, 'kernel2': k2, 'sinc_kernel': sinc})
    model.optimize_parameters(1)
    logs = model.get_current_log()
    for k in ['l_g_pix', 'l_g_gan', 'l_d_real', 'l_d_fake']:
        assert np.isfinite(logs[k])
