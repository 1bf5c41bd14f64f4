"""Torch parity for the bilinear StyleGAN2 generator variant."""

import sys
from os import path as osp

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from ref_loader import load_ref_module  # noqa: E402

from basicsr4rs_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402


def test_stylegan2_bilinear_generator_parity():
    import torch
    torch.manual_seed(0)
    from basicsr4rs_tpu.archs.stylegan2_bilinear_arch import StyleGAN2GeneratorBilinear
    ref_mod = load_ref_module('basicsr/archs/stylegan2_bilinear_arch.py')
    kwargs = dict(out_size=32, num_style_feat=16, num_mlp=2, channel_multiplier=1, narrow=0.25)
    ref_net = ref_mod.StyleGAN2GeneratorBilinear(**kwargs).eval()
    z = np.random.RandomState(0).randn(2, 16).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref_net([torch.from_numpy(z)], randomize_noise=False)
    ref_out = ref_out.numpy()

    mine = StyleGAN2GeneratorBilinear(**kwargs)
    params = convert_torch_state_dict(ref_net.state_dict(),
                                      rules=StyleGAN2GeneratorBilinear.TORCH_KEY_RULES)
    noises = params.pop('noises')
    # noise buffers: torch (1,1,r,r) -> NHWC (1,r,r,1)
    noise = [jnp.asarray(np.transpose(noises[f'noise{i}'], (0, 2, 3, 1)))
             for i in range(mine.num_layers)]
    out, _ = mine.apply({'params': params}, [jnp.asarray(z)], noise=noise,
                        rngs={'noise': jax.random.PRNGKey(0)})
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)


def test_resblock_bilinear_shapes():
    from basicsr4rs_tpu.archs.stylegan2_bilinear_arch import ResBlockBilinear
    blk = ResBlockBilinear(8, 16)
    x = jnp.ones((1, 16, 16, 8))
    params = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(params, x)
    assert out.shape == (1, 8, 8, 16)
