"""StyleGAN2 parity vs the reference torch code (CPU-runnable thanks to the
native upfirdn2d fallback and a pure-torch fused_act stub)."""

import sys
from os import path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))
from ref_loader import load_ref_module  # noqa: E402

from basicsr4rs_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402


def test_upfirdn2d_parity():
    import torch
    ref_up = load_ref_module('basicsr/ops/upfirdn2d/upfirdn2d.py')
    from basicsr4rs_tpu.ops.upfirdn2d import upfirdn2d
    rng = np.random.RandomState(0)
    x = rng.rand(2, 4, 12, 12).astype(np.float32)
    k = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32)
    k /= k.sum()
    for up, down, pad in [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (2, 2))]:
        ref = ref_up.upfirdn2d_native(torch.from_numpy(x), torch.from_numpy(k),
                                      up, up, down, down, pad[0], pad[1], pad[0], pad[1]).numpy()
        mine = np.asarray(upfirdn2d(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(k),
                                    up=up, down=down, pad=pad)).transpose(0, 3, 1, 2)
        assert mine.shape == ref.shape, (up, down, pad, mine.shape, ref.shape)
        np.testing.assert_allclose(mine, ref, atol=1e-6, err_msg=f'{up},{down},{pad}')


def test_stylegan2_generator_parity():
    import torch
    ref_mod = load_ref_module('basicsr/archs/stylegan2_arch.py')
    ref_net = ref_mod.StyleGAN2Generator(out_size=32, num_style_feat=16, num_mlp=2,
                                         channel_multiplier=1, narrow=0.25).eval()
    rng = np.random.RandomState(0)
    z = rng.randn(2, 16).astype(np.float32)
    # use stored (deterministic) noise on both sides
    with torch.no_grad():
        ref_img, _ = ref_net([torch.from_numpy(z)], randomize_noise=False)
    ref_img = ref_img.numpy()

    from basicsr4rs_tpu.archs.stylegan2_arch import StyleGAN2Generator
    sd = ref_net.state_dict()
    noises = {k: v for k, v in sd.items() if k.startswith('noises.')}
    params = convert_torch_state_dict(
        {k: v for k, v in sd.items() if not k.startswith('noises.')},
        rules=StyleGAN2Generator.TORCH_KEY_RULES)
    noise_vars = {f'noise{i}': jnp.asarray(noises[f'noises.noise{i}'].numpy().transpose(0, 2, 3, 1))
                  for i in range(len(noises))}
    mine = StyleGAN2Generator(out_size=32, num_style_feat=16, num_mlp=2,
                              channel_multiplier=1, narrow=0.25)
    img, _ = mine.apply({'params': params, 'noises': noise_vars}, [jnp.asarray(z)],
                        randomize_noise=False)
    img = np.asarray(img).transpose(0, 3, 1, 2)
    assert img.shape == ref_img.shape
    np.testing.assert_allclose(img, ref_img, atol=2e-4, rtol=1e-3)


def test_stylegan2_discriminator_parity():
    import torch
    ref_mod = load_ref_module('basicsr/archs/stylegan2_arch.py')
    ref_net = ref_mod.StyleGAN2Discriminator(out_size=32, channel_multiplier=1,
                                             narrow=0.25, stddev_group=2).eval()
    rng = np.random.RandomState(1)
    x = rng.rand(4, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_net(torch.from_numpy(x)).numpy()
    from basicsr4rs_tpu.archs.stylegan2_arch import StyleGAN2Discriminator
    params = convert_torch_state_dict(ref_net.state_dict())
    mine = StyleGAN2Discriminator(out_size=32, channel_multiplier=1, narrow=0.25,
                                  stddev_group=2)
    out = mine.apply({'params': params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=1e-3)


def test_generator_randomize_noise_runs():
    from basicsr4rs_tpu.archs.stylegan2_arch import StyleGAN2Generator
    net = StyleGAN2Generator(out_size=16, num_style_feat=8, num_mlp=2,
                             channel_multiplier=1, narrow=0.25)
    z = jnp.asarray(np.random.RandomState(0).randn(1, 8).astype(np.float32))
    variables = net.init({'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}, [z])
    img, _ = net.apply(variables, [z], rngs={'noise': jax.random.PRNGKey(2)})
    assert img.shape == (1, 16, 16, 3)
    # style mixing with two codes
    z2 = jnp.asarray(np.random.RandomState(1).randn(1, 8).astype(np.float32))
    img2, latent = net.apply(variables, [z, z2], rngs={'noise': jax.random.PRNGKey(3)},
                             inject_index=2, return_latents=True)
    assert latent.shape[1] == net.num_latent
