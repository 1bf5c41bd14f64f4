"""Regression tests for round-1 advisor findings:

- LDL loss must actually contribute to the G objective when ``ldl_opt`` is
  configured (reference realesrgan_model.py:211-226).
- Gated-off G iterations (``net_d_iters``/``net_d_init_iters``) must leave
  the optimizer moments untouched while still advancing the LR schedule
  (reference leaves optim_g alone but steps schedulers every iteration).
- ``save_training_state``/``resume_training`` must round-trip BatchNorm
  ``batch_stats`` collections.
- strict network loading must reject unexpected keys like torch's strict
  ``load_state_dict``.
"""

import os

import numpy as np
import optax
import pytest

from basicsr4rs_tpu.models import build_model
from basicsr4rs_tpu.utils.options import yaml_load


def _gan_opt(extra_train='', ema_decay=0.999, net_d_init_iters=0):
    return yaml_load(f"""
name: test_advice_gan
model_type: SRGANModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 8, num_block: 1, upscale: 4}}
network_d: {{type: UNetDiscriminatorSN, num_in_ch: 3, num_feat: 8}}
path: {{pretrain_network_g: ~, pretrain_network_d: ~}}
train:
  ema_decay: {ema_decay}
  net_d_iters: 1
  net_d_init_iters: {net_d_init_iters}
  optim_g: {{type: Adam, lr: !!float 1e-4}}
  optim_d: {{type: Adam, lr: !!float 1e-4}}
  scheduler: {{type: MultiStepLR, milestones: [50000], gamma: 0.5}}
  total_iter: 100
  warmup_iter: -1
  pixel_opt: {{type: L1Loss, loss_weight: !!float 1e-2, reduction: mean}}
  gan_opt: {{type: GANLoss, gan_type: vanilla, real_label_val: 1.0, fake_label_val: 0.0, loss_weight: !!float 5e-3}}
{extra_train}
val:
  val_freq: 100
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 4}}
""")


LDL = "  ldl_opt: {type: L1Loss, loss_weight: 1.0, reduction: mean}"


def _batch(n=2, size=8):
    rng = np.random.RandomState(0)
    return {'lq': rng.rand(n, size, size, 3).astype(np.float32),
            'gt': rng.rand(n, size * 4, size * 4, 3).astype(np.float32)}


def test_ldl_loss_wired_into_g_objective():
    model = build_model(_gan_opt(extra_train=LDL))
    assert model.cri_ldl is not None
    model.feed_data(_batch())
    model.optimize_parameters(1)
    logs = model.get_current_log()
    assert 'l_g_ldl' in logs, list(logs)
    assert np.isfinite(logs['l_g_ldl'])
    # l_g_total must include the ldl term
    parts = logs['l_g_pix'] + logs['l_g_ldl'] + logs['l_g_gan']
    np.testing.assert_allclose(logs['l_g_total'], parts, rtol=1e-5)


def test_ldl_requires_ema():
    with pytest.raises(ValueError, match='ema_decay'):
        build_model(_gan_opt(extra_train=LDL, ema_decay=0))


def _find_states(opt_state, cls):
    found = []

    def rec(node):
        if isinstance(node, cls):
            found.append(node)
        elif isinstance(node, (tuple, list)):
            for x in node:
                rec(x)

    rec(opt_state)
    return found


def test_gated_g_iteration_leaves_adam_untouched_but_steps_schedule():
    model = build_model(_gan_opt(net_d_init_iters=2))
    model.feed_data(_batch())
    model.optimize_parameters(1)  # gated: step 1 <= net_d_init_iters

    adam = _find_states(model.state.opt_state, optax.ScaleByAdamState)
    assert adam, 'expected a ScaleByAdamState in the G optimizer state'
    assert int(adam[0].count) == 0, 'Adam count advanced on a gated iteration'
    mu_max = max(float(np.abs(np.asarray(leaf)).max())
                 for leaf in np.asarray(adam[0].mu['conv_first']['kernel']).ravel()[None])
    assert mu_max == 0.0, 'Adam first moment decayed/updated on a gated iteration'

    sched = _find_states(model.state.opt_state, optax.ScaleByScheduleState)
    assert sched, 'expected a ScaleByScheduleState in the G optimizer state'
    assert int(sched[0].count) == 1, 'LR schedule did not advance on gated iteration'

    model.optimize_parameters(2)  # gated again
    model.optimize_parameters(3)  # applied (step 3 > 2)
    adam = _find_states(model.state.opt_state, optax.ScaleByAdamState)
    sched = _find_states(model.state.opt_state, optax.ScaleByScheduleState)
    assert int(adam[0].count) == 1
    assert int(sched[0].count) == 3


def _duf_opt():
    return yaml_load("""
name: test_duf_stats
model_type: VideoBaseModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {type: DUF, scale: 4, num_layer: 16}
datasets: {train: {num_frame: 7}}
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
    psnr: {type: calculate_psnr, crop_border: 0}
""")


def test_batch_stats_saved_and_resumed(tmp_path):
    opt = _duf_opt()
    opt['path']['models'] = str(tmp_path / 'models')
    opt['path']['training_states'] = str(tmp_path / 'states')
    os.makedirs(opt['path']['models'])
    os.makedirs(opt['path']['training_states'])

    model = build_model(opt)
    assert model.state.stats, 'DUF should carry BatchNorm batch_stats'
    rng = np.random.RandomState(0)
    batch = {'lq': rng.rand(1, 7, 8, 8, 3).astype(np.float32),
             'gt': rng.rand(1, 32, 32, 3).astype(np.float32)}
    model.feed_data(batch)
    model.optimize_parameters(1)
    stats_flat = {k: np.asarray(v) for k, v in
                  _flatten(model.state.stats).items()}
    assert any(np.abs(v).max() > 0 for v in stats_flat.values())
    model.save(0, 1)

    model2 = build_model(_duf_opt())
    state = model2.load_training_state(
        os.path.join(opt['path']['training_states'], '1.state'))
    model2.resume_training(state)
    resumed_flat = {k: np.asarray(v) for k, v in
                    _flatten(model2.state.stats).items()}
    assert set(resumed_flat) == set(stats_flat)
    for k in stats_flat:
        np.testing.assert_allclose(resumed_flat[k], stats_flat[k], rtol=1e-6,
                                   err_msg=f'batch_stats {k} lost on resume')


def _flatten(d, prefix=()):
    out = {}
    for k, v in dict(d).items():
        if isinstance(v, dict) or hasattr(v, 'items'):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out['.'.join(prefix + (k,))] = v
    return out


def test_strict_load_rejects_unexpected_keys():
    from basicsr4rs_tpu.models.base_model import _match_tree
    template = {'conv': {'kernel': np.zeros((3, 3, 4, 4), np.float32)}}
    loaded = {'conv': {'kernel': np.zeros((3, 3, 4, 4), np.float32)},
              'typo_layer': {'kernel': np.zeros((1,), np.float32)}}
    with pytest.raises(KeyError, match='unexpected'):
        _match_tree(loaded, template, strict=True)
    # non-strict still loads the matching subset
    out = _match_tree(loaded, template, strict=False)
    assert 'conv' in out and 'typo_layer' not in out
