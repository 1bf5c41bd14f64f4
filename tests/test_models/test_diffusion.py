"""Diffusion stack tests: ResShift engine math, UNetModelSwin, autoencoders,
ResShiftModel train/sample."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basicsr4rs_tpu.models import build_model
from basicsr4rs_tpu.utils.gaussian_diffusion import (GaussianDiffusion, LossType, ModelMeanType,
                                                     create_gaussian_diffusion,
                                                     get_named_eta_schedule)
from basicsr4rs_tpu.utils.options import yaml_load


def _diffusion(steps=4, kappa=2.0):
    return create_gaussian_diffusion(
        normalize_input=True, schedule_name='exponential', sf=4, min_noise_level=0.2,
        steps=steps, kappa=kappa, etas_end=0.99, schedule_kwargs={'power': 0.3},
        predict_type='xstart', timestep_respacing=None, scale_factor=1.0, latent_flag=True)


def test_eta_schedule():
    s = get_named_eta_schedule('exponential', 15, 0.04, kappa=2.0, kwargs={'power': 0.3})
    assert s.shape == (15,)
    assert np.all(np.diff(s) > 0)  # monotonically increasing
    assert s[-1] == pytest.approx(0.99, rel=1e-6)  # sqrt_eta endpoint = etas_end


def test_eta_schedule_matches_reference_bitexact():
    """Numeric parity with the reference's schedule arithmetic
    (gaussian_diffusion.py:10-70) — bit-exact, both are float64 numpy."""
    import importlib.util
    import sys
    import types
    sys.modules.setdefault('basicsr', types.ModuleType('basicsr'))
    spec = importlib.util.spec_from_file_location(
        'ref_gd', '/root/reference/basicsr/utils/gaussian_diffusion.py')
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)
    for steps, kappa, power in [(15, 2.0, 0.3), (4, 1.0, 1.0), (1000, 2.0, 0.3)]:
        want = ref_mod.get_named_eta_schedule(
            'exponential', steps, 0.04, kappa=kappa, kwargs={'power': power})
        got = get_named_eta_schedule(
            'exponential', steps, 0.04, kappa=kappa, kwargs={'power': power})
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_q_sample_endpoints():
    """At t=T-1 eta ~ etas_end: x_t ~ y; at t=0 eta small: x_t ~ x_0."""
    d = _diffusion(steps=8)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32)) + 5.0  # offset to separate
    noise = jnp.zeros_like(x0)
    x_t0 = d.q_sample(x0, y, jnp.zeros((2,), jnp.int32), noise)
    x_tT = d.q_sample(x0, y, jnp.full((2,), d.num_timesteps - 1, jnp.int32), noise)
    assert float(jnp.mean(jnp.abs(x_t0 - x0))) < float(jnp.mean(jnp.abs(x_t0 - y)))
    assert float(jnp.mean(jnp.abs(x_tT - y))) < float(jnp.mean(jnp.abs(x_tT - x0)))


def test_training_losses_perfect_model_zero_loss():
    """A model that returns the true x0 gives ~zero mse for START_X."""
    d = _diffusion(steps=4)
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(2, 2, 2, 3).astype(np.float32))  # LQ at 1/sf

    def perfect_model(x_t, t, **kw):
        return x0

    loss_dict, z_t, pred = d.training_losses(jax.random.PRNGKey(0), perfect_model, x0, y,
                                             jnp.asarray([1, 2]))
    assert float(jnp.max(loss_dict['mse'])) < 1e-10
    np.testing.assert_allclose(np.asarray(pred), np.asarray(x0))


def test_p_sample_loop_converges_to_model_prediction():
    """With a constant-x0 model, the reverse chain should land near that x0."""
    d = _diffusion(steps=6, kappa=1.0)
    rng = np.random.RandomState(2)
    target = jnp.asarray((rng.rand(1, 8, 8, 3) * 2 - 1).astype(np.float32)) * 0.5
    y = jnp.zeros((1, 2, 2, 3))  # gets bicubic-upsampled x4 to 8x8

    def model(x_t, t, **kw):
        return target

    out = d.p_sample_loop(jax.random.PRNGKey(0), y, model)
    assert out.shape == (1, 8, 8, 3)
    # posterior contracts toward pred_xstart as t -> 0
    assert float(jnp.mean(jnp.abs(out - target))) < 0.3


def test_respacing():
    d_full = _diffusion(steps=8)
    d15 = create_gaussian_diffusion(
        normalize_input=True, schedule_name='exponential', sf=4, min_noise_level=0.2,
        steps=8, kappa=2.0, etas_end=0.99, schedule_kwargs={'power': 0.3},
        predict_type='xstart', timestep_respacing=4, scale_factor=1.0)
    assert d15.num_timesteps == 4
    assert d15.original_num_steps == 8
    # respaced etas are a subset of the full ladder
    assert set(np.round(d15.sqrt_etas, 8)).issubset(set(np.round(d_full.sqrt_etas, 8)))


def test_unet_model_swin_forward():
    from basicsr4rs_tpu.archs.unet_arch import UNetModelSwin
    net = UNetModelSwin(image_size=16, in_channels=3, model_channels=8, out_channels=3,
                        num_res_blocks=1, attention_resolutions=(16, 8), channel_mult=(1, 2),
                        num_heads=2, swin_embed_dim=8, window_size=4, lq_size=16)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.asarray([0, 3])
    lq = jnp.zeros((2, 16, 16, 3))
    params = net.init(jax.random.PRNGKey(0), x, t, lq=lq)['params']
    out = net.apply({'params': params}, x, t, lq=lq)
    assert out.shape == (2, 16, 16, 3)
    # zero-init final conv -> zero output at init (ADM convention)
    assert float(jnp.abs(out).max()) == 0.0


def test_sr3_unet_forward():
    from basicsr4rs_tpu.archs.sr3_arch import SR3UNet
    net = SR3UNet(in_channel=6, out_channel=3, inner_channel=8, norm_groups=4,
                  channel_mults=(1, 2), attn_res=(8,), res_blocks=1, image_size=16)
    x = jnp.zeros((1, 16, 16, 6))
    t = jnp.asarray([0.5])
    params = net.init(jax.random.PRNGKey(0), x, t)['params']
    assert net.apply({'params': params}, x, t).shape == (1, 16, 16, 3)


DD = dict(ch=8, out_ch=3, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(4,),
          in_channels=3, resolution=16, z_channels=3, double_z=False)


def test_resshift_model_train_and_sample(tmp_path):
    opt = yaml_load("""
name: test_resshift
model_type: ResShiftModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {type: UNetModelSwin, image_size: 16, in_channels: 3, model_channels: 8,
            out_channels: 3, num_res_blocks: 1, attention_resolutions: [8],
            channel_mult: [1, 2], num_heads: 2, swin_embed_dim: 8, window_size: 4,
            cond_lq: true, lq_size: 16, lq_channels: 3}
autoencoder: {type: VQModelTorch, n_embed: 16, embed_dim: 3,
              ddconfig: {ch: 8, out_ch: 3, ch_mult: [1, 2], num_res_blocks: 1,
                         attn_resolutions: [4], in_channels: 3, resolution: 16,
                         z_channels: 3, double_z: false}}
diffusion: {normalize_input: true, schedule_name: exponential, sf: 4,
            min_noise_level: 0.2, steps: 4, kappa: 2.0, etas_end: 0.99,
            schedule_kwargs: {power: 0.3}, predict_type: xstart,
            timestep_respacing: ~, scale_factor: 1.0, latent_flag: true}
path: {pretrain_network_g: ~, pretrain_network_ae: ~}
train:
  ema_decay: 0.999
  use_amp: false
  optim_g: {type: Adam, lr: !!float 5e-4}
  scheduler: {type: ConstantLR}
  total_iter: 10
val:
  val_freq: 10
  metrics:
    psnr: {type: calculate_psnr, crop_border: 4}
""")
    model = build_model(opt)
    rng = np.random.RandomState(0)
    # gt 32x32 -> latent 16x16 (AE downsamples x2); lq 8x8 (x4 upsample -> 32 -> latent 16)
    batch = {'lq': (rng.rand(2, 8, 8, 3).astype(np.float32) * 2 - 1),
             'gt': (rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)}
    model.feed_data(batch)
    model.optimize_parameters(1)
    logs = model.get_current_log()
    assert np.isfinite(logs['loss']) and 'mse1' in logs and 'mse4' in logs
    model.feed_data(batch)
    model.optimize_parameters(2)
    assert model.current_step() == 2

    # full diffusion sampling
    model.test()
    assert model.output.shape == (2, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(model.output)))


def _l2s_batch(rng, b=1):
    return {
        'lq': {'rgb': rng.rand(b, 8, 8, 3).astype(np.float32) * 2 - 1,
               'nss': rng.rand(b, 8, 8, 3).astype(np.float32) * 2 - 1},
        'gt': {'rgb': rng.rand(b, 24, 24, 3).astype(np.float32) * 2 - 1,
               'nss': rng.rand(b, 12, 12, 3).astype(np.float32) * 2 - 1},
        'sample_path': ['a/b/c'], 'img_name': ['a_b_c'],
    }


def test_align_frozen_diff_model():
    opt = yaml_load("""
name: test_alignfrozen
model_type: AlignFrozenDiffModel
scale: 3
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {type: UNetModelSwin, image_size: 24, in_channels: 6, model_channels: 8,
            out_channels: 6, num_res_blocks: 1, attention_resolutions: [12],
            channel_mult: [1, 2], num_heads: 2, swin_embed_dim: 8, window_size: 4,
            cond_lq: true, lq_size: 24, lq_channels: 6}
autoencoder: {type: AlignAutoencoder, num_in_ch: 12, num_out_ch: 6, num_feat: 8, num_block: 1}
diffusion: {normalize_input: true, schedule_name: exponential, sf: 3,
            min_noise_level: 0.2, steps: 3, kappa: 2.0, etas_end: 0.99,
            schedule_kwargs: {power: 0.3}, predict_type: xstart, timestep_respacing: ~}
path: {pretrain_network_g: ~, pretrain_network_ae: ~}
train:
  ema_decay: 0
  use_amp: false
  optim_g: {type: Adam, lr: !!float 5e-4}
  scheduler: {type: ConstantLR}
  total_iter: 5
val:
  val_freq: 5
  metrics:
    psnr: {type: calculate_psnr, crop_border: 3}
""")
    model = build_model(opt)
    rng = np.random.RandomState(3)
    model.feed_data(_l2s_batch(rng))
    model.optimize_parameters(1)
    assert np.isfinite(model.get_current_log()['loss'])


def test_align_joint_diff_model():
    opt = yaml_load("""
name: test_alignjoint
model_type: AlignJointDiffModel
scale: 3
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g:
  type: ResNetAE_SwinUNet
  unet_args: {image_size: 24, in_channels: 6, model_channels: 8, out_channels: 6,
              num_res_blocks: 1, attention_resolutions: [], channel_mult: [1],
              num_heads: 2, swin_embed_dim: 8, window_size: 4, cond_lq: true, lq_size: 24}
  align_autoencoder_args: {num_in_ch: 12, num_out_ch: 6, num_feat: 8, num_block: 1}
  lr_encoder_args: {num_in_ch: 6, num_out_ch: 6, num_feat: 8, num_block: 1}
diffusion: {normalize_input: true, schedule_name: exponential, sf: 3,
            min_noise_level: 0.2, steps: 3, kappa: 2.0, etas_end: 0.99,
            schedule_kwargs: {power: 0.3}, predict_type: xstart, timestep_respacing: ~}
path: {pretrain_network_g: ~}
train:
  ema_decay: 0
  use_amp: false
  optim_g: {type: Adam, lr: !!float 5e-4}
  scheduler: {type: ConstantLR}
  total_iter: 5
  encoder_opt: {type: MSELoss, loss_weight: 1.0}
  decoder_opt: {type: L1Loss, loss_weight: 1.0}
  sr_opt: {type: L1Loss, loss_weight: 1.0}
  diffusion_opt: {type: MSELoss, loss_weight: 1.0}
val:
  val_freq: 5
  metrics:
    psnr: {type: calculate_psnr, crop_border: 3}
""")
    model = build_model(opt)
    rng = np.random.RandomState(4)
    model.feed_data(_l2s_batch(rng))
    model.optimize_parameters(1)
    logs = model.get_current_log()
    for k in ['align', 'diffusion', 'reconstruction', 'sr']:
        assert np.isfinite(logs[k]), logs
