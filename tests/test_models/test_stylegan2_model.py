"""StyleGAN2Model training-step test: D/G steps, lazy R1 and path-length
regularization cadences, EMA, fixed-sample validation."""

import os

import numpy as np
import pytest

from basicsr4rs_tpu.models import build_model
from basicsr4rs_tpu.utils.options import yaml_load


def _opt(tmp_path):
    opt = yaml_load("""
name: test_sg2
model_type: StyleGAN2Model
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {type: StyleGAN2Generator, out_size: 16, num_style_feat: 8, num_mlp: 2,
            channel_multiplier: 1, narrow: 0.25}
network_d: {type: StyleGAN2Discriminator, out_size: 16, channel_multiplier: 1,
            narrow: 0.25, stddev_group: 2}
path: {pretrain_network_g: ~, pretrain_network_d: ~}
train:
  optim_g: {type: Adam, lr: !!float 2e-3}
  optim_d: {type: Adam, lr: !!float 2e-3}
  total_iter: 100
  r1_reg_weight: 10
  path_reg_weight: 2
  net_g_reg_every: 2
  net_d_reg_every: 2
  mixing_prob: 0.9
  path_batch_shrink: 2
  gan_opt: {type: GANLoss, gan_type: wgan_softplus, loss_weight: 1.0}
val:
  num_val_samples: 2
""")
    opt['path']['visualization'] = str(tmp_path / 'vis')
    opt['path']['models'] = str(tmp_path / 'models')
    opt['path']['training_states'] = str(tmp_path / 'states')
    os.makedirs(opt['path']['models'], exist_ok=True)
    os.makedirs(opt['path']['training_states'], exist_ok=True)
    return opt


def test_stylegan2_train_and_reg(tmp_path):
    model = build_model(_opt(tmp_path))
    rng = np.random.RandomState(0)
    real = rng.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1

    model.feed_data({'gt': real})
    model.optimize_parameters(1)   # step 1: no regularization
    logs1 = model.get_current_log()
    assert logs1['l_d_r1'] == 0 and logs1['l_g_path'] == 0
    for k in ['l_d', 'l_g', 'real_score', 'fake_score']:
        assert np.isfinite(logs1[k])

    model.feed_data({'gt': real})
    model.optimize_parameters(2)   # step 2: both lazy regs fire
    logs2 = model.get_current_log()
    assert np.isfinite(logs2['l_d_r1']) and logs2['l_d_r1'] != 0
    assert np.isfinite(logs2['l_g_path'])

    # EMA drifts from params
    import jax
    diff = jax.tree_util.tree_map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                                  model.state.params, model.state.ema_params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0

    # validation saves a sample grid
    model.nondist_validation(None, 2, None, True)
    assert os.path.isfile(os.path.join(model.opt['path']['visualization'], 'train', 'train_2.png'))

    # save + resume
    model.save(0, 2)
    state = model.load_training_state(os.path.join(model.opt['path']['training_states'], '2.state'))
    model2 = build_model(_opt(tmp_path))
    model2.resume_training(state)
    assert model2.current_step() == 2
    model2.feed_data({'gt': real})
    model2.optimize_parameters(3)
    assert np.isfinite(model2.get_current_log()['l_d'])
