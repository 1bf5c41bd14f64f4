"""Training-TRAJECTORY parity vs the reference torch semantics (VERDICT r2
#4): zero-egress leaves checkpoint-quality anchors untestable, but training
*dynamics* can be proven locally — identical init, identical batches, N SGD
steps in both frameworks must produce matching loss curves. This fails if
optimizer wiring, loss reductions, EMA semantics or the G/D gating ever
drift from the reference (basicsr/models/sr_model.py:91-129,
srgan_model.py:85-141, base_model.py:75-85).

torch (CPU) drives the actual reference arch modules via ref_loader; the
JAX side runs through the REAL model classes (SRModel / SRGANModel), not
raw nets — the model lifecycle is the thing under test.
"""

import sys
from os import path as osp

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from ref_loader import load_ref_module  # noqa: E402

from basicsr4rs_tpu.models import build_model  # noqa: E402
from basicsr4rs_tpu.utils.options import yaml_load  # noqa: E402
from basicsr4rs_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402

N_STEPS = 50
LR = 1e-2
EMA = 0.9


def _batches(n, batch=4, lr_size=8, scale=4, seed=7):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        yield (rng.rand(batch, lr_size, lr_size, 3).astype(np.float32),
               rng.rand(batch, lr_size * scale, lr_size * scale, 3).astype(np.float32))


def test_msrresnet_sgd_trajectory_matches_torch():
    import torch

    ref_mod = load_ref_module('basicsr/archs/srresnet_arch.py')
    torch.manual_seed(0)
    net_t = ref_mod.MSRResNet(num_in_ch=3, num_out_ch=3, num_feat=8,
                              num_block=2, upscale=4).train()
    params = convert_torch_state_dict(net_t.state_dict())

    opt = yaml_load(f"""
name: parity_sr
model_type: SRModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 8, num_block: 2, upscale: 4}}
path: {{pretrain_network_g: ~}}
train:
  ema_decay: {EMA}
  optim_g: {{type: SGD, lr: !!float {LR}}}
  scheduler: {{type: ConstantLR}}
  total_iter: 1000
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
val: {{val_freq: 1000}}
""")
    model = build_model(opt)
    model.params = params
    model.setup_optimizers()

    opt_t = torch.optim.SGD(net_t.parameters(), lr=LR)
    ema_t = {k: v.detach().clone() for k, v in net_t.state_dict().items()}
    crit = torch.nn.L1Loss()

    losses_j, losses_t = [], []
    for lq, gt in _batches(N_STEPS):
        model.feed_data({'lq': lq, 'gt': gt})
        model.optimize_parameters(1)
        losses_j.append(float(model.get_current_log()['l_pix']))

        lq_t = torch.from_numpy(np.ascontiguousarray(lq.transpose(0, 3, 1, 2)))
        gt_t = torch.from_numpy(np.ascontiguousarray(gt.transpose(0, 3, 1, 2)))
        opt_t.zero_grad()
        loss_t = crit(net_t(lq_t), gt_t)
        loss_t.backward()
        opt_t.step()
        losses_t.append(float(loss_t.detach()))
        with torch.no_grad():
            # reference model_ema (base_model.py:75-85)
            sd = net_t.state_dict()
            for k in ema_t:
                ema_t[k].mul_(EMA).add_(sd[k], alpha=1 - EMA)

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-4, atol=2e-5,
                               err_msg='SGD loss trajectories diverged')
    # trained (first vs last loss differ measurably)
    assert abs(losses_t[0] - losses_t[-1]) > 1e-4

    # EMA parity after N steps: our in-step EMA == reference lerp
    ema_j_want = convert_torch_state_dict({k: v for k, v in ema_t.items()})
    got_flat = dict(_flatten(model.state.ema_params))
    want_flat = dict(_flatten(ema_j_want))
    assert set(got_flat) == set(want_flat)
    for k in want_flat:
        np.testing.assert_allclose(np.asarray(got_flat[k]), np.asarray(want_flat[k]),
                                   rtol=1e-3, atol=1e-5, err_msg=f'EMA drift at {k}')


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield '/'.join(prefix), tree


def test_swinir_sgd_trajectory_matches_torch():
    """Same proof for the transformer flagship: LayerNorm/attention/MLP
    gradients and the SwinIRModel lifecycle must reproduce the reference's
    SGD loss curve (reference swinir_arch.py + sr_model.py:91-129)."""
    import torch

    ref_mod = load_ref_module('basicsr/archs/swinir_arch.py')
    torch.manual_seed(0)
    kwargs = dict(img_size=8, patch_size=1, in_chans=3, embed_dim=8,
                  depths=[2], num_heads=[2], window_size=4, mlp_ratio=2.,
                  upscale=2, img_range=1., upsampler='pixelshuffledirect',
                  resi_connection='1conv', drop_path_rate=0.)
    net_t = ref_mod.SwinIR(**kwargs).train()

    from basicsr4rs_tpu.archs.swinir_arch import SwinIR
    rules = SwinIR(**{**kwargs, 'depths': (2,), 'num_heads': (2,)}).torch_key_rules
    params = convert_torch_state_dict(net_t.state_dict(), rules=rules)

    opt = yaml_load(f"""
name: parity_swinir
model_type: SwinIRModel
scale: 2
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {{type: SwinIR, img_size: 8, patch_size: 1, in_chans: 3, embed_dim: 8,
             depths: [2], num_heads: [2], window_size: 4, mlp_ratio: 2,
             upscale: 2, img_range: 1.0, upsampler: pixelshuffledirect,
             resi_connection: 1conv, drop_path_rate: 0.0}}
path: {{pretrain_network_g: ~}}
train:
  ema_decay: 0
  optim_g: {{type: SGD, lr: !!float {LR}}}
  scheduler: {{type: ConstantLR}}
  total_iter: 1000
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
val: {{val_freq: 1000}}
""")
    model = build_model(opt)
    model.params = params
    model.setup_optimizers()

    opt_t = torch.optim.SGD(net_t.parameters(), lr=LR)
    crit = torch.nn.L1Loss()

    losses_j, losses_t = [], []
    for lq, gt in _batches(N_STEPS, batch=2, lr_size=8, scale=2, seed=11):
        model.feed_data({'lq': lq, 'gt': gt})
        model.optimize_parameters(1)
        losses_j.append(float(model.get_current_log()['l_pix']))

        lq_t = torch.from_numpy(np.ascontiguousarray(lq.transpose(0, 3, 1, 2)))
        gt_t = torch.from_numpy(np.ascontiguousarray(gt.transpose(0, 3, 1, 2)))
        opt_t.zero_grad()
        loss_t = crit(net_t(lq_t), gt_t)
        loss_t.backward()
        opt_t.step()
        losses_t.append(float(loss_t.detach()))

    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-4, atol=5e-5,
                               err_msg='SwinIR SGD loss trajectories diverged')
    assert abs(losses_t[0] - losses_t[-1]) > 1e-4


def test_video_recurrent_fix_flow_trajectory_matches_torch():
    """Pins VideoRecurrentModel's optimizer semantics against the reference
    (video_recurrent_model.py:22-64): the spynet lr multiplier (param
    groups) and the fix_flow warm-up freeze (requires_grad toggling) are
    update masks here — the SGD loss curve must match through the freeze
    boundary."""
    import torch

    FIX, MUL, STEPS = 4, 0.125, 12
    ref_mod = load_ref_module('basicsr/archs/basicvsr_arch.py')
    torch.manual_seed(0)
    net_t = ref_mod.BasicVSR(num_feat=8, num_block=1).train()
    sd = {k: v for k, v in net_t.state_dict().items()
          if not k.endswith(('spynet.mean', 'spynet.std'))}
    params = convert_torch_state_dict(sd)

    opt = yaml_load(f"""
name: parity_video
model_type: VideoRecurrentModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {{type: BasicVSR, num_feat: 8, num_block: 1, spynet_path: ~}}
path: {{pretrain_network_g: ~}}
train:
  ema_decay: 0
  fix_flow: {FIX}
  flow_lr_mul: {MUL}
  optim_g: {{type: SGD, lr: !!float {LR}}}
  scheduler: {{type: ConstantLR}}
  total_iter: 1000
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
val: {{val_freq: 1000}}
""")
    model = build_model(opt)
    model.params = params
    model.setup_optimizers()

    # reference param groups: normal at lr, spynet at lr*mul (:28-46)
    normal_p = [p for n, p in net_t.named_parameters() if 'spynet' not in n]
    flow_p = [p for n, p in net_t.named_parameters() if 'spynet' in n]
    opt_t = torch.optim.SGD([{'params': normal_p, 'lr': LR},
                             {'params': flow_p, 'lr': LR * MUL}])
    crit = torch.nn.L1Loss()

    rng = np.random.RandomState(13)
    losses_j, losses_t = [], []
    for it in range(1, STEPS + 1):
        lq = rng.rand(1, 2, 64, 64, 3).astype(np.float32)
        gt = rng.rand(1, 2, 256, 256, 3).astype(np.float32)
        model.feed_data({'lq': lq, 'gt': gt})
        model.optimize_parameters(it)
        losses_j.append(float(model.get_current_log()['l_pix']))

        # reference freeze toggling (:52-61)
        if it == 1:
            for n, p in net_t.named_parameters():
                if 'spynet' in n or 'edvr' in n:
                    p.requires_grad_(False)
        elif it == FIX:
            net_t.requires_grad_(True)
        lq_t = torch.from_numpy(np.ascontiguousarray(lq.transpose(0, 1, 4, 2, 3)))
        gt_t = torch.from_numpy(np.ascontiguousarray(gt.transpose(0, 1, 4, 2, 3)))
        opt_t.zero_grad()
        loss_t = crit(net_t(lq_t), gt_t)
        loss_t.backward()
        opt_t.step()
        losses_t.append(float(loss_t.detach()))

    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-4, atol=5e-5,
                               err_msg='fix_flow/flow_lr_mul trajectories diverged')
    # the freeze boundary actually bit: spynet params moved after iter FIX
    import jax
    deltas = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
              for a, b in zip(jax.tree_util.tree_leaves(model.state.params['spynet']),
                              jax.tree_util.tree_leaves(params['spynet']))]
    assert max(deltas) > 0, 'spynet never unfroze'


def test_resshift_sgd_trajectory_matches_torch():
    """Diffusion training-trajectory parity (VERDICT r3 #6b): N SGD steps of
    ResShift — random per-sample timesteps, injected noise, latents through
    the FROZEN VQ autoencoder, bicubic LQ upsampling, q_sample and the
    xstart-MSE objective — must reproduce the reference loss curve
    (reference resshift_model.py:113-174 + utils/gaussian_diffusion.py:545).
    tt/noise are drawn once in numpy and injected into both frameworks (the
    same surface the reference's ``training_losses(noise=...)`` exposes)."""
    import torch

    STEPS, T = 20, 4
    ref_gd = load_ref_module('basicsr/utils/gaussian_diffusion.py')
    ref_unet = load_ref_module('basicsr/archs/unet_arch.py')
    ref_ae_mod = load_ref_module('basicsr/archs/autoencoder_arch.py')

    unet_kwargs = dict(image_size=16, in_channels=3, model_channels=32,
                       out_channels=3, num_res_blocks=1,
                       attention_resolutions=[8], channel_mult=[1, 2],
                       num_heads=4, swin_embed_dim=32, window_size=4,
                       cond_lq=True, lq_size=16)
    ddconfig = dict(ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
                    attn_resolutions=[4], in_channels=3, resolution=16,
                    z_channels=3, double_z=False, dropout=0.0)
    diff_kwargs = dict(normalize_input=True, schedule_name='exponential',
                       sf=4, min_noise_level=0.2, steps=T, kappa=2.0,
                       etas_end=0.99, schedule_kwargs={'power': 0.3},
                       predict_type='xstart', timestep_respacing=None,
                       scale_factor=1.0, latent_flag=True)

    torch.manual_seed(0)
    net_t = ref_unet.UNetModelSwin(**unet_kwargs).train()
    ae_t = ref_ae_mod.VQModelTorch(ddconfig=ddconfig, n_embed=16,
                                   embed_dim=3).eval()
    for p in ae_t.parameters():
        p.requires_grad_(False)
    d_t = ref_gd.create_gaussian_diffusion(**diff_kwargs)

    from basicsr4rs_tpu.archs.autoencoder_arch import VQModelTorch
    from basicsr4rs_tpu.archs.unet_arch import UNetModelSwin
    g_params = convert_torch_state_dict(
        net_t.state_dict(), rules=getattr(UNetModelSwin, 'TORCH_KEY_RULES', None))
    ae_params = convert_torch_state_dict(ae_t.state_dict(),
                                         rules=VQModelTorch.TORCH_KEY_RULES)

    opt = yaml_load(f"""
name: parity_resshift
model_type: ResShiftModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {{type: UNetModelSwin, image_size: 16, in_channels: 3, model_channels: 32,
            out_channels: 3, num_res_blocks: 1, attention_resolutions: [8],
            channel_mult: [1, 2], num_heads: 4, swin_embed_dim: 32, window_size: 4,
            cond_lq: true, lq_size: 16, lq_channels: 3}}
autoencoder: {{type: VQModelTorch, n_embed: 16, embed_dim: 3,
              ddconfig: {{ch: 32, out_ch: 3, ch_mult: [1, 2], num_res_blocks: 1,
                         attn_resolutions: [4], in_channels: 3, resolution: 16,
                         z_channels: 3, double_z: false}}}}
diffusion: {{normalize_input: true, schedule_name: exponential, sf: 4,
            min_noise_level: 0.2, steps: {T}, kappa: 2.0, etas_end: 0.99,
            schedule_kwargs: {{power: 0.3}}, predict_type: xstart,
            timestep_respacing: ~, scale_factor: 1.0, latent_flag: true}}
path: {{pretrain_network_g: ~, pretrain_network_ae: ~}}
train:
  ema_decay: 0
  use_amp: false
  optim_g: {{type: SGD, lr: !!float {LR}}}
  scheduler: {{type: ConstantLR}}
  total_iter: 1000
val: {{val_freq: 1000}}
""")
    model = build_model(opt)
    model.params = g_params
    model.first_stage.params = ae_params       # frozen AE, trace-time capture
    model.setup_optimizers()

    opt_t = torch.optim.SGD(net_t.parameters(), lr=LR)

    rng = np.random.RandomState(23)
    losses_j, losses_t = [], []
    for _ in range(STEPS):
        lq = (rng.rand(2, 8, 8, 3).astype(np.float32) * 2 - 1)
        gt = (rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
        tt = rng.randint(0, T, size=(2,)).astype(np.int32)
        noise = rng.randn(2, 16, 16, 3).astype(np.float32)  # latent-shaped

        model.feed_data({'lq': lq, 'gt': gt, 'tt': tt, 'noise': noise})
        model.optimize_parameters(1)
        losses_j.append(float(model.get_current_log()['mse']))

        lq_t = torch.from_numpy(np.ascontiguousarray(lq.transpose(0, 3, 1, 2)))
        gt_t = torch.from_numpy(np.ascontiguousarray(gt.transpose(0, 3, 1, 2)))
        noise_t = torch.from_numpy(np.ascontiguousarray(noise.transpose(0, 3, 1, 2)))
        opt_t.zero_grad()
        loss_dict, _, _ = d_t.training_losses(
            net_t, gt_t, lq_t, torch.from_numpy(tt).long(),
            first_stage_model=ae_t, model_kwargs={'lq': lq_t}, noise=noise_t)
        loss_t = loss_dict['mse'].mean()
        loss_t.backward()
        opt_t.step()
        losses_t.append(float(loss_t.detach()))

    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-3, atol=1e-4,
                               err_msg='ResShift SGD loss trajectories diverged')
    assert abs(losses_t[0] - losses_t[-1]) > 1e-4


def test_srgan_gd_cycle_matches_torch():
    """Two full G/D cycles of SRGAN: G gets pixel + GAN loss with D frozen,
    then D trains on real and detached-fake (reference srgan_model.py:85-141
    ordering, including net_d_iters gating at 1/0)."""
    import torch
    import torch.nn.functional as F

    ref_sr = load_ref_module('basicsr/archs/srresnet_arch.py')
    ref_d = load_ref_module('basicsr/archs/discriminator_arch.py')
    torch.manual_seed(1)
    net_g_t = ref_sr.MSRResNet(num_in_ch=3, num_out_ch=3, num_feat=8,
                               num_block=1, upscale=4).train()
    net_d_t = ref_d.VGGStyleDiscriminator(num_in_ch=3, num_feat=4).train()

    g_params = convert_torch_state_dict(net_g_t.state_dict())
    # BN running stats live in flax batch_stats, not params — and both
    # frameworks init them identically (mean 0, var 1), so filtering them
    # from the converted tree keeps init parity exact.
    from basicsr4rs_tpu.archs.discriminator_arch import VGGStyleDiscriminator
    d_sd = {k: v for k, v in net_d_t.state_dict().items()
            if not k.endswith(('running_mean', 'running_var'))}
    d_params = convert_torch_state_dict(d_sd,
                                        rules=VGGStyleDiscriminator.TORCH_KEY_RULES)

    opt = yaml_load(f"""
name: parity_srgan
model_type: SRGANModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 8, num_block: 1, upscale: 4}}
network_d: {{type: VGGStyleDiscriminator, num_in_ch: 3, num_feat: 4}}
path: {{pretrain_network_g: ~, pretrain_network_d: ~}}
train:
  ema_decay: 0
  net_d_iters: 1
  net_d_init_iters: 0
  optim_g: {{type: SGD, lr: !!float {LR}}}
  optim_d: {{type: SGD, lr: !!float {LR}}}
  scheduler: {{type: ConstantLR}}
  total_iter: 1000
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
  gan_opt: {{type: GANLoss, gan_type: vanilla, real_label_val: 1.0, fake_label_val: 0.0, loss_weight: 0.1}}
val: {{val_freq: 1000}}
""")
    model = build_model(opt)
    from basicsr4rs_tpu.parallel.mesh import replicate
    model.state = replicate(
        model.state.replace(params=g_params,
                            opt_state=model.tx_g.init(g_params)), model.mesh)
    model.d_state = replicate(
        model.d_state.replace(params=d_params,
                              opt_state=model.tx_d.init(d_params)), model.mesh)

    opt_g = torch.optim.SGD(net_g_t.parameters(), lr=LR)
    opt_d = torch.optim.SGD(net_d_t.parameters(), lr=LR)

    logs_j, logs_t = [], []
    for lq, gt in _batches(3, batch=2, lr_size=32, seed=11):
        model.feed_data({'lq': lq, 'gt': gt})
        model.optimize_parameters(1)
        log = model.get_current_log()
        logs_j.append({k: float(v) for k, v in log.items()})

        lq_t = torch.from_numpy(np.ascontiguousarray(lq.transpose(0, 3, 1, 2)))
        gt_t = torch.from_numpy(np.ascontiguousarray(gt.transpose(0, 3, 1, 2)))
        # ---- G step (reference srgan_model.py:85-117)
        for p in net_d_t.parameters():
            p.requires_grad = False
        opt_g.zero_grad()
        out = net_g_t(lq_t)
        l_g_pix = F.l1_loss(out, gt_t)
        fake_pred = net_d_t(out)
        l_g_gan = 0.1 * F.binary_cross_entropy_with_logits(
            fake_pred, torch.ones_like(fake_pred))
        (l_g_pix + l_g_gan).backward()
        opt_g.step()
        # ---- D step (reference srgan_model.py:120-136)
        for p in net_d_t.parameters():
            p.requires_grad = True
        opt_d.zero_grad()
        real_pred = net_d_t(gt_t)
        l_d_real = F.binary_cross_entropy_with_logits(
            real_pred, torch.ones_like(real_pred))
        l_d_real.backward()
        fake_pred_d = net_d_t(out.detach())
        l_d_fake = F.binary_cross_entropy_with_logits(
            fake_pred_d, torch.zeros_like(fake_pred_d))
        l_d_fake.backward()
        opt_d.step()
        logs_t.append({'l_g_pix': float(l_g_pix.detach()), 'l_g_gan': float(l_g_gan.detach()),
                       'l_d_real': float(l_d_real.detach()), 'l_d_fake': float(l_d_fake.detach())})

    for i, (lj, lt) in enumerate(zip(logs_j, logs_t)):
        for k, want in lt.items():
            assert k in lj, f'step {i}: missing log key {k}'
            assert lj[k] == pytest.approx(want, rel=2e-3, abs=2e-4), (
                f'step {i} {k}: jax {lj[k]} vs torch {want}')
