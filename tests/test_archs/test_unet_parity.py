"""Torch parity for the ResShift UNets (UNetModelSwin) and autoencoder."""

import sys
from os import path as osp

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from ref_loader import load_ref_module  # noqa: E402

from basicsr4rs_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402


def test_unet_model_swin_parity():
    import torch
    torch.manual_seed(0)
    from basicsr4rs_tpu.archs.unet_arch import UNetModelSwin
    ref_mod = load_ref_module('basicsr/archs/unet_arch.py')
    kwargs = dict(image_size=16, in_channels=3, model_channels=32, out_channels=3,
                  num_res_blocks=1, attention_resolutions=[8], channel_mult=[1, 2],
                  num_heads=4, swin_embed_dim=32, window_size=4, cond_lq=True,
                  lq_size=16)
    ref_net = ref_mod.UNetModelSwin(**kwargs).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([1, 3], np.int64)
    lq = rng.randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_net(torch.from_numpy(x), torch.from_numpy(t),
                          lq=torch.from_numpy(lq)).numpy()

    mine = UNetModelSwin(**kwargs)
    params = convert_torch_state_dict(ref_net.state_dict(),
                                      rules=getattr(UNetModelSwin, 'TORCH_KEY_RULES', None))
    out = mine.apply({'params': params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(t), lq=jnp.asarray(lq.transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-3)


def test_vq_autoencoder_parity():
    import torch
    torch.manual_seed(0)
    from basicsr4rs_tpu.archs.autoencoder_arch import VQModelTorch
    ref_mod = load_ref_module('basicsr/archs/autoencoder_arch.py')
    ddconfig = dict(ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
                    attn_resolutions=[8], in_channels=3, resolution=16,
                    z_channels=3, double_z=False, dropout=0.0)
    ref = ref_mod.VQModelTorch(ddconfig=ddconfig, n_embed=32, embed_dim=3).eval()
    x = np.random.RandomState(0).randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        z = ref.encode(torch.from_numpy(x)).numpy()
        rec = ref.decode(torch.from_numpy(z)).numpy()
    mine = VQModelTorch(ddconfig=ddconfig, n_embed=32, embed_dim=3)
    params = convert_torch_state_dict(ref.state_dict(), rules=VQModelTorch.TORCH_KEY_RULES)
    zm = mine.apply({'params': params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    method=VQModelTorch.encode)
    recm = mine.apply({'params': params}, zm, method=VQModelTorch.decode)
    np.testing.assert_allclose(np.asarray(zm).transpose(0, 3, 1, 2), z, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(recm).transpose(0, 3, 1, 2), rec, atol=5e-5, rtol=1e-4)


def test_kl_autoencoder_parity():
    import torch
    torch.manual_seed(0)
    from basicsr4rs_tpu.archs.autoencoder_arch import AutoencoderKLTorch
    ref_mod = load_ref_module('basicsr/archs/autoencoder_arch.py')
    ddconfig = dict(ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
                    attn_resolutions=[8], in_channels=3, resolution=16,
                    z_channels=3, double_z=True, dropout=0.0)
    ref = ref_mod.AutoencoderKLTorch(embed_dim=3, ddconfig=ddconfig).eval()
    x = np.random.RandomState(1).randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        mode = ref.encode(torch.from_numpy(x), sample_posterior=False).numpy()
        rec = ref.decode(torch.from_numpy(mode)).numpy()
    mine = AutoencoderKLTorch(embed_dim=3, ddconfig=ddconfig)
    params = convert_torch_state_dict(ref.state_dict(), rules=AutoencoderKLTorch.TORCH_KEY_RULES)
    zm = mine.apply({'params': params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    method=AutoencoderKLTorch.encode, sample_posterior=False)
    recm = mine.apply({'params': params}, zm, method=AutoencoderKLTorch.decode)
    np.testing.assert_allclose(np.asarray(zm).transpose(0, 3, 1, 2), mode, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(recm).transpose(0, 3, 1, 2), rec, atol=5e-5, rtol=1e-4)


def test_unet_model_conv_free_parity():
    """Vanilla-attention ADM UNetModel parity."""
    import torch
    torch.manual_seed(0)
    from basicsr4rs_tpu.archs.unet_arch import UNetModel
    ref_mod = load_ref_module('basicsr/archs/unet_arch.py')
    kwargs = dict(image_size=16, in_channels=3, model_channels=32, out_channels=3,
                  num_res_blocks=1, attention_resolutions=[8], channel_mult=[1, 2],
                  num_heads=4, cond_lq=False)
    ref_net = ref_mod.UNetModel(**kwargs).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([0, 5], np.int64)
    with torch.no_grad():
        want = ref_net(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    mine = UNetModel(**kwargs)
    params = convert_torch_state_dict(ref_net.state_dict(), rules=UNetModel.TORCH_KEY_RULES)
    got = mine.apply({'params': params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_alignae_parity():
    import torch
    torch.manual_seed(0)
    from basicsr4rs_tpu.archs.alignae_arch import AlignAutoencoder
    ref_mod = load_ref_module('basicsr/archs/alignae_arch.py')
    kwargs = dict(num_in_ch=12, num_out_ch=6, num_feat=16, num_block=2)
    ref_net = ref_mod.AlignAutoencoder(**kwargs).eval()
    # the reference CAM.forward references a nonexistent self.linear (the
    # module cannot run as shipped); patch in the evident intent — the
    # shared linear_max MLP — to obtain a runnable ground truth
    for mod in ref_net.modules():
        if type(mod).__name__ == 'CAM':
            object.__setattr__(mod, 'linear', mod.linear_max)
    x = np.random.RandomState(0).randn(1, 12, 24, 24).astype(np.float32)
    with torch.no_grad():
        out = ref_net(torch.from_numpy(x))
    mine = AlignAutoencoder(**kwargs)
    params = convert_torch_state_dict(ref_net.state_dict())
    got = mine.apply({'params': params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for key in ('stage1', 'stage2'):
        want = out[key].numpy()
        g = np.asarray(got[key]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(g, want, atol=2e-5, rtol=1e-4)


def test_sr3_unet_parity():
    import torch
    torch.manual_seed(0)
    from basicsr4rs_tpu.archs.sr3_arch import SR3UNet
    ref_mod = load_ref_module('basicsr/archs/sr3_arch.py')
    kwargs = dict(in_channel=6, out_channel=3, inner_channel=16, norm_groups=8,
                  channel_mults=(1, 2), attn_res=(8,), res_blocks=1, image_size=16)
    ref_net = ref_mod.UNet(**kwargs).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(1, 6, 16, 16).astype(np.float32)
    t = rng.rand(1).astype(np.float32) * 0.5 + 0.2   # continuous noise level
    with torch.no_grad():
        want = ref_net(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    mine = SR3UNet(**{**kwargs, 'channel_mults': (1, 2), 'attn_res': (8,)})
    params = convert_torch_state_dict(ref_net.state_dict(),
                                      rules=getattr(SR3UNet, 'TORCH_KEY_RULES', None))
    got = mine.apply({'params': params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_vgg_feature_extractor_and_perceptual_loss_parity():
    import torch
    torch.manual_seed(0)
    from basicsr4rs_tpu.archs.vgg_arch import VGGFeatureExtractor
    from basicsr4rs_tpu.losses.perceptual_loss import PerceptualLoss
    ref_vgg_mod = load_ref_module('basicsr/archs/vgg_arch.py')
    layers = ['conv1_2', 'relu2_2', 'conv3_3']
    ref_ext = ref_vgg_mod.VGGFeatureExtractor(layer_name_list=layers, vgg_type='vgg16',
                                              use_input_norm=True, range_norm=False).eval()
    x = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = {k: v.numpy() for k, v in ref_ext(torch.from_numpy(x)).items()}

    params = convert_torch_state_dict(ref_ext.state_dict(),
                                      rules=((r'^vgg_net\.', ''),))
    mine = VGGFeatureExtractor(layer_name_list=layers, vgg_type='vgg16',
                               use_input_norm=True, range_norm=False)
    got = mine.apply({'params': params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for k in layers:
        np.testing.assert_allclose(np.asarray(got[k]).transpose(0, 3, 1, 2), want[k],
                                   atol=1e-4, rtol=1e-4)

    # perceptual + style loss on the same features
    ref_loss_mod = load_ref_module('basicsr/losses/basic_loss.py')
    ref_loss = ref_loss_mod.PerceptualLoss(
        layer_weights={k: 1.0 for k in layers}, vgg_type='vgg16',
        use_input_norm=True, range_norm=False, perceptual_weight=1.0,
        style_weight=0.5, criterion='l1').eval()
    ref_loss.vgg.load_state_dict(ref_ext.state_dict())
    y = np.random.RandomState(1).rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        lp_t, ls_t = ref_loss(torch.from_numpy(x), torch.from_numpy(y))

    my_loss = PerceptualLoss(layer_weights={k: 1.0 for k in layers}, vgg_type='vgg16',
                             use_input_norm=True, range_norm=False,
                             perceptual_weight=1.0, style_weight=0.5, criterion='l1',
                             vgg_params=params)
    lp, ls = my_loss(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(float(lp), float(lp_t), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(ls), float(ls_t), rtol=1e-4, atol=1e-6)
