"""plot_util / lmdb gating / swinir RS aliases."""

import numpy as np
import pytest


def test_plot_util_txt_readers(tmp_path):
    from basicsr4rs_tpu.utils.plot_util import (read_data_from_txt_1v,
                                                read_data_from_txt_2v, smooth_data)
    log = tmp_path / 'train.log'
    log.write_text('iter:     100, psnr: 28.31\n'
                   'garbage line\n'
                   'iter:     200, psnr: 29.02\n')
    steps, vals = read_data_from_txt_2v(str(log), r'iter:\s+(\d+), psnr: ([\d.]+)')
    assert steps == [100, 200]
    assert vals == [28.31, 29.02]
    vals1 = read_data_from_txt_1v(str(log), r'iter:\s+\d+, psnr: ([\d.]+)')
    assert vals1 == [28.31, 29.02]
    sm = smooth_data([1.0, 3.0], 0.5)
    assert sm == [1.0, 2.0]


def test_lmdb_util_gated():
    from basicsr4rs_tpu.utils import lmdb_util
    with pytest.raises(ImportError):
        lmdb_util._require_lmdb()


def test_swinir_rs_aliases_registered():
    import basicsr4rs_tpu.models  # noqa: F401
    from basicsr4rs_tpu.utils.registry import MODEL_REGISTRY
    from basicsr4rs_tpu.models.srrs_model import SRRSModel
    from basicsr4rs_tpu.models.srrs_l2s_model import L2SSingleModel
    swinir_l2s = MODEL_REGISTRY.get('SwinIRL2sModel')
    assert issubclass(swinir_l2s, L2SSingleModel)
    assert issubclass(MODEL_REGISTRY.get('SwinIRRSModel'), SRRSModel)
    assert MODEL_REGISTRY.get('SwinIRHMModel') is not None


def test_swinir_stylecnn_dual_branch():
    import jax
    import jax.numpy as jnp
    from basicsr4rs_tpu.archs import build_network
    net = build_network({
        'type': 'SwinIR_StyleCNN',
        'sr_net_args': {'upscale': 3, 'in_chans': 6, 'img_size': 12, 'window_size': 4,
                        'depths': [2], 'embed_dim': 8, 'num_heads': [2], 'mlp_ratio': 2,
                        'upsampler': 'pixelshuffle'},
        'style_net_args': {'in_chans': 6, 'out_chans': 6, 'num_feat': 8},
    })
    x = jnp.zeros((1, 12, 12, 6))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert set(out) == {'hm', 'gt'}
    assert out['hm'].shape == out['gt'].shape == (1, 36, 36, 6)


def test_dead_config_aliases_registered():
    import basicsr4rs_tpu.archs  # noqa: F401
    import basicsr4rs_tpu.models  # noqa: F401
    from basicsr4rs_tpu.utils.registry import ARCH_REGISTRY, MODEL_REGISTRY
    from basicsr4rs_tpu.archs.alignae_arch import AlignAutoencoder
    from basicsr4rs_tpu.models.align_single_model import AlignSingleModel
    from basicsr4rs_tpu.models.resshift_l2s_model import ResShiftL2SModel
    assert ARCH_REGISTRY.get('StyleResNet') is AlignAutoencoder
    assert MODEL_REGISTRY.get('RegistrationModel') is AlignSingleModel
    assert MODEL_REGISTRY.get('RSResDiffModel') is ResShiftL2SModel
