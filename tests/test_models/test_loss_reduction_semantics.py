"""Multi-device loss-logging semantics (reference base_model.py:376-401).

The reference dist-reduces a per-rank torch loss dict; here the jitted train
step computes the loss on the GLOBALLY sharded batch, so the logged scalar
is already the global mean — XLA inserts the cross-device reduction inside
the jit. These tests pin that contract on an 8-device mesh: if a future
change ever made the logged loss a per-shard value, they fail.
"""

import jax
import numpy as np

from basicsr4rs_tpu.models import build_model
from basicsr4rs_tpu.utils.options import yaml_load


def _opt():
    return yaml_load("""
name: test_loss_reduction
model_type: SRModel
scale: 4
num_gpu: 8
manual_seed: 0
is_train: true
dist: true
rank: 0
world_size: 1
network_g: {type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 8, num_block: 1, upscale: 4}
path: {pretrain_network_g: ~}
train:
  ema_decay: 0
  optim_g: {type: Adam, lr: !!float 1e-4}
  scheduler: {type: ConstantLR}
  total_iter: 100
  pixel_opt: {type: L1Loss, loss_weight: 1.0, reduction: mean}
val:
  val_freq: 100
  metrics:
    psnr: {type: calculate_psnr, crop_border: 4}
""")


def test_logged_loss_is_global_mean_over_shards():
    assert jax.device_count() >= 8, 'conftest should provide 8 virtual devices'
    model = build_model(_opt())
    assert model.mesh.shape['data'] == 8

    rng = np.random.RandomState(0)
    lq = rng.rand(8, 8, 8, 3).astype(np.float32)
    # wildly different GT magnitude per shard: a per-shard loss would differ
    # from the global mean by orders of magnitude
    gt = np.zeros((8, 32, 32, 3), np.float32)
    for i in range(8):
        gt[i] = 10.0 ** (i - 3)

    # expected global loss with the INITIAL params (the step logs the loss
    # computed before the update)
    out = np.asarray(model.net_g.apply(
        {'params': jax.device_get(model.state.params)}, lq))
    expected_global = np.abs(out - gt).mean()
    shard0 = np.abs(out[:1] - gt[:1]).mean()
    assert abs(expected_global - shard0) / expected_global > 0.5, \
        'fixture failed to make shards distinguishable'

    model.feed_data({'lq': lq, 'gt': gt})
    assert len(model.batch['lq'].sharding.device_set) == 8
    model.optimize_parameters(1)

    # values stay on device until read (async dispatch contract)
    l_pix = float(np.asarray(model.log_dict['l_pix']))
    np.testing.assert_allclose(l_pix, expected_global, rtol=1e-4,
                               err_msg='logged loss is not the global mean '
                                       'over all data shards')


def test_logged_loss_stays_on_device():
    """reduce_loss_dict must not force a host sync on the hot path."""
    model = build_model(_opt())
    rng = np.random.RandomState(1)
    model.feed_data({'lq': rng.rand(8, 8, 8, 3).astype(np.float32),
                     'gt': rng.rand(8, 32, 32, 3).astype(np.float32)})
    model.optimize_parameters(1)
    assert isinstance(model.log_dict['l_pix'], jax.Array), \
        'loss values should remain device arrays until logging reads them'
