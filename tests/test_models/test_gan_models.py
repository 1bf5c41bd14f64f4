"""SRGAN/ESRGAN training-step tests (reference pattern: srgan two-phase
optimization). Uses tiny nets; perceptual loss omitted (no VGG weights in
this environment)."""

import numpy as np
import pytest

from basicsr4rs_tpu.models import build_model
from basicsr4rs_tpu.utils.options import yaml_load


def _gan_opt(model_type='SRGANModel', net_d='UNetDiscriminatorSN', gan_type='vanilla',
             net_d_iters=1, net_d_init_iters=0):
    return yaml_load(f"""
name: test_gan
model_type: {model_type}
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 8, num_block: 1, upscale: 4}}
network_d: {{type: {net_d}, num_in_ch: 3, num_feat: 8}}
path: {{pretrain_network_g: ~, pretrain_network_d: ~}}
train:
  ema_decay: 0.999
  net_d_iters: {net_d_iters}
  net_d_init_iters: {net_d_init_iters}
  optim_g: {{type: Adam, lr: !!float 1e-4}}
  optim_d: {{type: Adam, lr: !!float 1e-4}}
  scheduler: {{type: MultiStepLR, milestones: [50000], gamma: 0.5}}
  total_iter: 100
  warmup_iter: -1
  pixel_opt: {{type: L1Loss, loss_weight: !!float 1e-2, reduction: mean}}
  gan_opt: {{type: GANLoss, gan_type: {gan_type}, real_label_val: 1.0, fake_label_val: 0.0, loss_weight: !!float 5e-3}}
val:
  val_freq: 100
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 4}}
""")


def _batch(n=2, size=8):
    rng = np.random.RandomState(0)
    return {'lq': rng.rand(n, size, size, 3).astype(np.float32),
            'gt': rng.rand(n, size * 4, size * 4, 3).astype(np.float32)}


@pytest.mark.parametrize('model_type', ['SRGANModel', 'ESRGANModel'])
def test_gan_step(model_type):
    model = build_model(_gan_opt(model_type))
    model.feed_data(_batch())
    g0 = np.asarray(next(iter(
        model.state.params['conv_first']['kernel'].ravel()[None])))
    for i in range(1, 4):
        model.optimize_parameters(i)
    logs = model.get_current_log()
    for key in ['l_g_pix', 'l_g_gan', 'l_d_real', 'l_d_fake', 'out_d_real', 'out_d_fake']:
        assert key in logs, f'missing {key} in {list(logs)}'
        assert np.isfinite(logs[key])
    g1 = np.asarray(model.state.params['conv_first']['kernel'].ravel()[None])
    assert not np.allclose(g0, g1), 'G params did not update'


def test_gan_d_init_iters_gate():
    """G must not update during net_d_init_iters warmup."""
    model = build_model(_gan_opt(net_d_init_iters=2))
    model.feed_data(_batch())
    g0 = np.asarray(model.state.params['conv_first']['kernel'])
    model.optimize_parameters(1)
    g1 = np.asarray(model.state.params['conv_first']['kernel'])
    np.testing.assert_array_equal(g0, g1)  # gated
    model.optimize_parameters(2)
    model.optimize_parameters(3)
    g3 = np.asarray(model.state.params['conv_first']['kernel'])
    assert not np.allclose(g0, g3)  # now updating


def test_gan_vgg_discriminator_batchnorm():
    """VGGStyleDiscriminator carries BatchNorm batch_stats through the step."""
    opt = _gan_opt(net_d='VGGStyleDiscriminator')
    opt['network_d']['input_size'] = 128
    model = build_model(opt)
    model.feed_data(_batch(n=2, size=32))  # gt = 128 -> matches D input size
    model.optimize_parameters(1)
    assert model.d_state.stats, 'batch_stats missing'
    mean0 = np.asarray(model.d_state.stats['bn0_1']['mean']).copy()
    model.optimize_parameters(2)
    mean1 = np.asarray(model.d_state.stats['bn0_1']['mean'])
    assert not np.allclose(mean0, mean1), 'batch_stats not updating'


def test_gan_save_resume(tmp_path):
    import os
    opt = _gan_opt()
    opt['path']['models'] = str(tmp_path / 'models')
    opt['path']['training_states'] = str(tmp_path / 'states')
    os.makedirs(opt['path']['models'])
    os.makedirs(opt['path']['training_states'])
    model = build_model(opt)
    model.feed_data(_batch())
    model.optimize_parameters(1)
    model.save(0, 1)
    assert os.path.isdir(os.path.join(opt['path']['models'], 'net_g_1'))
    assert os.path.isdir(os.path.join(opt['path']['models'], 'net_d_1'))

    model2 = build_model(_gan_opt())
    state = model2.load_training_state(os.path.join(opt['path']['training_states'], '1.state'))
    model2.resume_training(state)
    assert model2.current_step() == 1
    model2.feed_data(_batch())
    model2.optimize_parameters(2)
    assert np.isfinite(model2.get_current_log()['l_g_total'])


def test_hifacegan_model():
    """Conditional multiscale D + feature matching in one jitted step
    (reference hifacegan_model.py:14-190)."""
    opt = yaml_load("""
name: test_hifacegan
model_type: HiFaceGANModel
scale: 1
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {type: HiFaceGAN, num_in_ch: 3, num_feat: 4, crop_size: 64}
network_d: {type: HiFaceGANDiscriminator, num_in_ch: 3, num_out_ch: 3, num_d: 2,
            n_layers_d: 4, num_feat: 8}
path: {pretrain_network_g: ~, pretrain_network_d: ~}
train:
  ema_decay: 0
  net_d_iters: 1
  net_d_init_iters: 0
  optim_g: {type: Adam, lr: !!float 1e-4}
  optim_d: {type: Adam, lr: !!float 1e-4}
  scheduler: {type: MultiStepLR, milestones: [50000], gamma: 0.5}
  total_iter: 100
  warmup_iter: -1
  pixel_opt: {type: L1Loss, loss_weight: 1.0, reduction: mean}
  feature_matching_opt: {type: GANFeatLoss, criterion: l1, loss_weight: 1.0}
  gan_opt: {type: MultiScaleGANLoss, gan_type: hinge, loss_weight: 1.0}
val:
  val_freq: 100
  metrics:
    psnr: {type: calculate_psnr, crop_border: 0}
""")
    model = build_model(opt)
    rng = np.random.RandomState(0)
    batch = {'lq': rng.rand(2, 64, 64, 3).astype(np.float32),
             'gt': rng.rand(2, 64, 64, 3).astype(np.float32)}
    model.feed_data(batch)
    p0 = np.asarray(model.state.params['lip_encoder']['model_0']['kernel']).copy()
    for it in (1, 2):
        model.optimize_parameters(it)
    logs = model.get_current_log()
    for k in ('l_g_pix', 'l_g_gan', 'l_g_feat', 'l_d_real', 'l_d_fake'):
        assert np.isfinite(logs[k]), logs
    p1 = np.asarray(model.state.params['lip_encoder']['model_0']['kernel'])
    assert not np.allclose(p0, p1)
    model.test()
    assert model.output.shape == (2, 64, 64, 3)


def test_hifacegan_model_rejects_ema():
    opt = yaml_load("""
name: test_hifacegan_ema
model_type: HiFaceGANModel
scale: 1
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {type: HiFaceGAN, num_in_ch: 3, num_feat: 4, crop_size: 64}
network_d: {type: HiFaceGANDiscriminator, num_in_ch: 3, num_out_ch: 3, num_d: 2, num_feat: 8}
path: {pretrain_network_g: ~, pretrain_network_d: ~}
train:
  ema_decay: 0.999
  optim_g: {type: Adam, lr: !!float 1e-4}
  optim_d: {type: Adam, lr: !!float 1e-4}
  scheduler: {type: MultiStepLR, milestones: [50000], gamma: 0.5}
  total_iter: 100
  pixel_opt: {type: L1Loss, loss_weight: 1.0}
  gan_opt: {type: MultiScaleGANLoss, gan_type: hinge, loss_weight: 1.0}
val: ~
""")
    with pytest.raises(NotImplementedError):
        build_model(opt)
