"""Official-zoo checkpoint key remaps.

The reference ships per-model conversion scripts that translate OFFICIAL
upstream checkpoints (original authors' key names) into basicsr layout
(reference scripts/model_conversion/convert_{models,dfdnet,ridnet,
stylegan}.py). This module is the TPU framework's equivalent: pure
``official key -> basicsr key`` functions. The resulting basicsr-layout
state dict then flows through the generic torch->NHWC/Orbax pipeline
(``basicsr4rs_tpu.utils.torch_convert`` + each arch's TORCH_KEY_RULES),
so one remap serves every backend detail.

Every function maps a single official key to a basicsr key, or ``None``
to drop it (e.g. EDSR/RCAN MeanShift convs, which basicsr folds into
constants). ``remap_state_dict`` applies a key function over a whole
checkpoint. Tested against the reference archs' real ``state_dict()``
key sets in tests/test_utils/test_zoo_remaps.py.
"""

from __future__ import annotations

import re
from collections import OrderedDict
from typing import Callable, Dict, Optional


def remap_state_dict(state: Dict, key_fn: Callable[[str], Optional[str]]) -> 'OrderedDict':
    out = OrderedDict()
    for k, v in state.items():
        nk = key_fn(k)
        if nk is not None:
            out[nk] = v
    return out


def save_as_orbax(state: Dict, arch_name: str, output: str) -> int:
    """basicsr-layout state dict -> this framework's NHWC Orbax checkpoint
    (through the arch's TORCH_KEY_RULES). Returns the tensor count."""
    import os

    import numpy as np
    from basicsr4rs_tpu.archs import build_network  # noqa: F401 (registers archs)
    from basicsr4rs_tpu.utils.registry import ARCH_REGISTRY
    from basicsr4rs_tpu.utils.torch_convert import convert_torch_state_dict

    cls = ARCH_REGISTRY.get(arch_name)
    rules = getattr(cls, 'TORCH_KEY_RULES', None)
    np_state = {k: (v.detach().cpu().numpy() if hasattr(v, 'detach') else np.asarray(v))
                for k, v in state.items()}
    params = convert_torch_state_dict(np_state, rules=rules)

    import jax
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(output), params)
    ckptr.wait_until_finished()
    return len(jax.tree_util.tree_leaves(params))


# --------------------------------------------------------------- EDSR
def remap_edsr(key: str, num_block: int = 32) -> Optional[str]:
    """EDSR-PyTorch (thstkdgus35) -> basicsr EDSR
    (inverse of reference convert_models.py:102-136)."""
    if key.startswith(('sub_mean', 'add_mean')):
        return None                      # basicsr uses constant mean shift
    if key.startswith('head.0.'):
        return key.replace('head.0.', 'conv_first.')
    m = re.match(r'body\.(\d+)\.body\.([02])\.(.+)', key)
    if m:
        i, conv, rest = m.groups()
        return f'body.{i}.conv{1 if conv == "0" else 2}.{rest}'
    if key.startswith(f'body.{num_block}.'):
        return key.replace(f'body.{num_block}.', 'conv_after_body.')
    if key.startswith('tail.0.0.'):
        return key.replace('tail.0.0.', 'upsample.0.')
    if key.startswith('tail.0.2.'):
        return key.replace('tail.0.2.', 'upsample.2.')
    if key.startswith('tail.1.'):
        return key.replace('tail.1.', 'conv_last.')
    return key


# --------------------------------------------------------------- RCAN
def remap_rcan(key: str, num_group: int = 10, num_block: int = 20) -> Optional[str]:
    """Official RCAN -> basicsr RCAN
    (inverse of reference convert_models.py:138-171)."""
    if key.startswith(('sub_mean', 'add_mean')):
        return None
    if key.startswith('head.0.'):
        return key.replace('head.0.', 'conv_first.')
    m = re.match(r'body\.(\d+)\.body\.(\d+)\.body\.(\d+)\.conv_du\.(\d+)\.(.+)', key)
    if m:
        g, b, c, du, rest = m.groups()
        # conv_du.{0,2} -> attention.{1,3}
        return f'body.{g}.residual_group.{b}.rcab.{c}.attention.{int(du) + 1}.{rest}'
    m = re.match(r'body\.(\d+)\.body\.(\d+)\.body\.(\d+)\.(.+)', key)
    if m:
        g, b, c, rest = m.groups()
        return f'body.{g}.residual_group.{b}.rcab.{c}.{rest}'
    m = re.match(rf'body\.(\d+)\.body\.{num_block}\.(.+)', key)
    if m:
        g, rest = m.groups()
        return f'body.{g}.conv.{rest}'
    if key.startswith(f'body.{num_group}.'):
        return key.replace(f'body.{num_group}.', 'conv_after_body.')
    if key.startswith('tail.0.0.'):
        return key.replace('tail.0.0.', 'upsample.0.')
    if key.startswith('tail.0.2.'):
        return key.replace('tail.0.2.', 'upsample.2.')
    if key.startswith('tail.1.'):
        return key.replace('tail.1.', 'conv_last.')
    return key


# --------------------------------------------------------------- ESRGAN
def remap_esrgan_rrdb(key: str) -> Optional[str]:
    """Official ESRGAN RRDB -> basicsr RRDBNet
    (inverse of reference convert_models.py:174-199)."""
    key = key.replace('RRDB_trunk', 'body').replace('RDB', 'rdb')
    key = key.replace('trunk_conv', 'conv_body')
    key = key.replace('upconv', 'conv_up')
    key = key.replace('HRconv', 'conv_hr')
    return key


# --------------------------------------------------------------- EDVR
_EDVR_RULES = (
    (r'^pre_deblur\.conv_first_1\.', 'predeblur.conv_first.'),
    (r'^pre_deblur\.conv_first_2\.', 'predeblur.stride_conv_hr1.'),
    (r'^pre_deblur\.conv_first_3\.', 'predeblur.stride_conv_hr2.'),
    (r'^pre_deblur\.deblur_L2_conv\.', 'predeblur.stride_conv_l2.'),
    (r'^pre_deblur\.deblur_L3_conv\.', 'predeblur.stride_conv_l3.'),
    (r'^pre_deblur\.RB_L3_1\.', 'predeblur.resblock_l3.'),
    (r'^pre_deblur\.RB_L2_(\d)\.', r'predeblur.resblock_l2_\1.'),
    (r'^pre_deblur\.RB_L1_(\d+)\.', lambda m: f'predeblur.resblock_l1.{int(m.group(1)) - 1}.'),
    (r'^fea_L(\d)_conv(\d)\.', r'conv_l\1_\2.'),
    (r'^pcd_align\.L(\d)_dcnpack\.conv_offset_mask\.(.+)$', r'pcd_align.dcn_pack.l\1.conv_offset.\2'),
    (r'^pcd_align\.L(\d)_dcnpack\.(.+)$', r'pcd_align.dcn_pack.l\1.\2'),
    (r'^pcd_align\.L(\d)_offset_conv(\d)\.(.+)$', r'pcd_align.offset_conv\2.l\1.\3'),
    (r'^pcd_align\.L(\d)_fea_conv\.(.+)$', r'pcd_align.feat_conv.l\1.\2'),
    (r'^pcd_align\.cas_dcnpack\.conv_offset_mask\.', 'pcd_align.cas_dcnpack.conv_offset.'),
    (r'^tsa_fusion\.tAtt_2\.', 'fusion.temporal_attn1.'),
    (r'^tsa_fusion\.tAtt_1\.', 'fusion.temporal_attn2.'),
    (r'^tsa_fusion\.fea_fusion\.', 'fusion.feat_fusion.'),
    (r'^tsa_fusion\.sAtt_add_(\d)\.', r'fusion.spatial_attn_add\1.'),
    (r'^tsa_fusion\.sAtt_L(\d)\.', r'fusion.spatial_attn_l\1.'),
    (r'^tsa_fusion\.sAtt_(\d)\.', r'fusion.spatial_attn\1.'),
    (r'^recon_trunk\.', 'reconstruction.'),
    (r'^HRconv\.', 'conv_hr.'),
)


def remap_edvr(key: str) -> Optional[str]:
    """Official EDVR -> basicsr EDVR (inverse of reference
    convert_models.py:4-100). conv_first / feature_extraction / upconv* /
    conv_last / conv_1x1 pass through unchanged."""
    for pat, repl in _EDVR_RULES:
        new, cnt = re.subn(pat, repl, key)
        if cnt:
            return new
    return key


# ----------------------------------------------------------------- DUF
def remap_duf_16l(key: str) -> Optional[str]:
    """Official DUF (16 layer) -> basicsr DUF with adapt_official_weights
    (inverse of reference convert_models.py:275-345)."""
    key = re.sub(r'^conv3d_(\d)\.', r'conv3d\1.', key)
    key = re.sub(r'^bn3d_2\.', 'bn3d2.', key)
    m = re.match(r'^dense_block_(1|2)\.(bn3d|conv3d)_(\d)\.(.+)$', key)
    if m:
        blk, kind, idx, rest = m.groups()
        pair, sub = divmod(int(idx) - 1, 2)
        # each Sequential is (bn, relu, conv, bn, relu(+pad), conv):
        # official bn/conv pairs land at slots 0/2 then 3/5
        slot = {(0, 'bn3d'): '0', (0, 'conv3d'): '2',
                (1, 'bn3d'): '3', (1, 'conv3d'): '5'}[(sub, kind)]
        if blk == '1':
            return f'dense_block1.dense_blocks.{pair}.{slot}.{rest}'
        return f'dense_block2.temporal_reduce{pair + 1}.{slot}.{rest}'
    return key


def reorder_duf_r2(weight, bias, scale: int):
    """The official DUF residual head interleaves RGB channels; basicsr
    groups them by channel (reference convert_models.py:346-358).
    weight: (3*scale^2, ...) torch OIDHW tensor (or numpy)."""
    import numpy as np
    w = np.asarray(weight)
    b = np.asarray(bias)
    w2, b2 = w.copy(), b.copy()
    s2 = scale * scale
    for i in range(3):
        w2[i * s2:(i + 1) * s2] = w[i::3]
        b2[i * s2:(i + 1) * s2] = b[i::3]
    return w2, b2


# ------------------------------------------------------------- RIDNet
def remap_ridnet_positional(official_state: Dict, target_names) -> 'OrderedDict':
    """The official RIDNet checkpoint's parameters are in definition order
    with different names; the map is purely positional (reference
    convert_ridnet.py:16-20)."""
    out = OrderedDict()
    values = list(official_state.values())
    names = list(target_names)
    if len(values) != len(names):
        raise ValueError(f'parameter count mismatch: official {len(values)} '
                         f'vs target {len(names)}')
    for name, value in zip(names, values):
        out[name] = value
    return out


# ---------------------------------------------------------- StyleGAN2
def remap_stylegan2_g(key: str, shape) -> Optional[str]:
    """stylegan2-pytorch (rosinality) generator -> basicsr StyleGAN2Generator
    (inverse of reference convert_stylegan.py:6-46). ``shape`` disambiguates
    noise weights (scalar shape [1])."""
    if key.startswith('style.'):
        return key.replace('style.', 'style_mlp.', 1)
    if key == 'input.input':
        return 'constant_input.weight'
    if key.startswith('conv1.conv.'):
        return key.replace('conv1.conv.', 'style_conv1.modulated_conv.', 1)
    if key.startswith('conv1.noise.'):
        return key.replace('conv1.noise.', 'style_conv1.', 1)
    if key.startswith('conv1.'):
        return key.replace('conv1.', 'style_conv1.', 1)
    if key.startswith('convs.'):
        nk = key.replace('convs.', 'style_convs.', 1).replace('.conv.', '.modulated_conv.')
        return nk.replace('.noise.weight', '.weight') if tuple(shape) == (1,) else nk
    if key.startswith('to_rgb1.conv.'):
        return key.replace('to_rgb1.conv.', 'to_rgb1.modulated_conv.', 1)
    if key.startswith('to_rgbs.'):
        return key.replace('.conv.', '.modulated_conv.')
    if key.startswith('noises.noise_'):
        return key.replace('noises.noise_', 'noises.noise', 1)
    return key


def remap_stylegan2_d(key: str) -> Optional[str]:
    """rosinality discriminator -> basicsr StyleGAN2Discriminator
    (inverse of reference convert_stylegan.py:49-66)."""
    if key.startswith('convs.'):
        return key.replace('convs.', 'conv_body.', 1)
    return key


# ------------------------------------------------------------- DFDNet
def remap_dfdnet(key: str, vgg_layer_index: Callable[[str], int] = None) -> Optional[str]:
    """Official DFDNet -> basicsr DFDNet (inverse of reference
    convert_dfdnet.py:7-60). The VGG tap remap needs the layer-name ->
    torchvision-index table; pass ``vgg_layer_index`` mapping a basicsr
    layer name (e.g. 'relu2_2') to its features index."""
    part_map = {'le': 'attn_blocks.left_eye', 're': 'attn_blocks.right_eye',
                'mo': 'attn_blocks.mouth', 'no': 'attn_blocks.nose'}
    for ori, crt in part_map.items():
        if key.startswith(ori + '.'):
            return key.replace(ori + '.', crt + '.', 1)
    m = re.match(r'^MSDilate\.conv(\d)\.(.+)$', key)
    if m:
        return f'multi_scale_dilation.conv_blocks.{int(m.group(1)) - 1}.{m.group(2)}'
    if key.startswith('MSDilate.convi.'):
        return key.replace('MSDilate.convi.', 'multi_scale_dilation.conv_fusion.', 1)
    if key.startswith('VggExtract.'):
        nk = key.replace('VggExtract.', 'vgg_extractor.', 1).replace('model.', 'vgg_net.')
        return nk.replace('RGB_mean', 'mean').replace('RGB_std', 'std')
    return key
