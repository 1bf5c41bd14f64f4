"""Official-zoo -> basicsr key remap mechanics (scripts/model_conversion).

No official weights exist in this environment, so these tests validate the
remap FUNCTIONS: official key sets are generated structurally (from the
original repos' naming conventions) and the remapped names are compared
against the READ-ONLY reference archs' real ``state_dict()`` key sets
(loaded via ref_loader). This pins the conversion mechanics end-to-end up
to the torch->NHWC step, which tests/test_archs/test_*_parity.py already
cover with synthetic weights.
"""

import sys
from os import path as osp

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..',
                            'scripts', 'model_conversion'))

import ref_loader  # noqa: E402
import zoo_remaps  # noqa: E402


def _remap_keys(keys, fn):
    out = []
    for k in keys:
        nk = fn(k)
        if nk is not None:
            out.append(nk)
    return out


def test_edsr_remap_full_key_set():
    m = ref_loader.load_ref_module('basicsr/archs/edsr_arch.py')
    net = m.EDSR(num_in_ch=3, num_out_ch=3, num_feat=8, num_block=16, upscale=4)
    target = set(net.state_dict().keys())

    official = ['sub_mean.weight', 'sub_mean.bias', 'add_mean.weight', 'add_mean.bias']
    for mod in ['head.0', 'body.16', 'tail.0.0', 'tail.0.2', 'tail.1']:
        official += [f'{mod}.weight', f'{mod}.bias']
    for i in range(16):
        for c in (0, 2):
            official += [f'body.{i}.body.{c}.weight', f'body.{i}.body.{c}.bias']

    got = set(_remap_keys(official, lambda k: zoo_remaps.remap_edsr(k, num_block=16)))
    assert got == target, (sorted(got - target), sorted(target - got))


def test_rcan_remap_full_key_set():
    m = ref_loader.load_ref_module('basicsr/archs/rcan_arch.py')
    net = m.RCAN(num_in_ch=3, num_out_ch=3, num_feat=8, num_group=2, num_block=2,
                 squeeze_factor=4, upscale=4, res_scale=1, img_range=1.,
                 rgb_mean=(0, 0, 0))
    target = set(net.state_dict().keys())

    official = []
    for mod in ['head.0', 'body.2', 'tail.0.0', 'tail.0.2', 'tail.1']:
        official += [f'{mod}.weight', f'{mod}.bias']
    for g in range(2):
        for b in range(2):
            for c in (0, 2):
                official += [f'body.{g}.body.{b}.body.{c}.weight',
                             f'body.{g}.body.{b}.body.{c}.bias']
            for du in (0, 2):
                official += [f'body.{g}.body.{b}.body.3.conv_du.{du}.weight',
                             f'body.{g}.body.{b}.body.3.conv_du.{du}.bias']
        official += [f'body.{g}.body.2.weight', f'body.{g}.body.2.bias']

    got = set(_remap_keys(official,
                          lambda k: zoo_remaps.remap_rcan(k, num_group=2, num_block=2)))
    assert got == target, (sorted(got - target), sorted(target - got))


def test_esrgan_remap_full_key_set():
    m = ref_loader.load_ref_module('basicsr/archs/rrdbnet_arch.py')
    net = m.RRDBNet(num_in_ch=3, num_out_ch=3, num_feat=8, num_block=2, num_grow_ch=4)
    target = set(net.state_dict().keys())

    official = ['conv_first.weight', 'conv_first.bias', 'trunk_conv.weight',
                'trunk_conv.bias', 'upconv1.weight', 'upconv1.bias',
                'upconv2.weight', 'upconv2.bias', 'HRconv.weight', 'HRconv.bias',
                'conv_last.weight', 'conv_last.bias']
    for i in range(2):
        for j in (1, 2, 3):
            for c in (1, 2, 3, 4, 5):
                official += [f'RRDB_trunk.{i}.RDB{j}.conv{c}.weight',
                             f'RRDB_trunk.{i}.RDB{j}.conv{c}.bias']

    got = set(_remap_keys(official, zoo_remaps.remap_esrgan_rrdb))
    assert got == target, (sorted(got - target), sorted(target - got))


def test_edvr_remap_full_key_set():
    m = ref_loader.load_ref_module('basicsr/archs/edvr_arch.py')
    net = m.EDVR(num_in_ch=3, num_out_ch=3, num_feat=8, num_frame=5,
                 deformable_groups=2, num_extract_block=2, num_reconstruct_block=2,
                 with_predeblur=True, with_tsa=True, hr_in=True)
    target = set(net.state_dict().keys())

    official = []

    def conv(name):
        official.extend([f'{name}.weight', f'{name}.bias'])

    def resblock(name):
        conv(f'{name}.conv1')
        conv(f'{name}.conv2')

    # predeblur (hr_in)
    conv('pre_deblur.conv_first_1')
    conv('pre_deblur.conv_first_2')
    conv('pre_deblur.conv_first_3')
    conv('pre_deblur.deblur_L2_conv')
    conv('pre_deblur.deblur_L3_conv')
    resblock('pre_deblur.RB_L3_1')
    resblock('pre_deblur.RB_L2_1')
    resblock('pre_deblur.RB_L2_2')
    for i in range(1, 6):
        resblock(f'pre_deblur.RB_L1_{i}')
    conv('conv_1x1')
    # feature extraction + pyramid
    for i in range(2):
        resblock(f'feature_extraction.{i}')
    conv('fea_L2_conv1')
    conv('fea_L2_conv2')
    conv('fea_L3_conv1')
    conv('fea_L3_conv2')
    # PCD alignment
    for lv in (3, 2, 1):
        conv(f'pcd_align.L{lv}_offset_conv1')
        conv(f'pcd_align.L{lv}_offset_conv2')
        if lv < 3:
            conv(f'pcd_align.L{lv}_offset_conv3')
            conv(f'pcd_align.L{lv}_fea_conv')
        conv(f'pcd_align.L{lv}_dcnpack')
        conv(f'pcd_align.L{lv}_dcnpack.conv_offset_mask')
    conv('pcd_align.cas_offset_conv1')
    conv('pcd_align.cas_offset_conv2')
    conv('pcd_align.cas_dcnpack')
    conv('pcd_align.cas_dcnpack.conv_offset_mask')
    # TSA fusion
    conv('tsa_fusion.tAtt_1')
    conv('tsa_fusion.tAtt_2')
    conv('tsa_fusion.fea_fusion')
    for i in range(1, 6):
        conv(f'tsa_fusion.sAtt_{i}')
    conv('tsa_fusion.sAtt_L1')
    conv('tsa_fusion.sAtt_L2')
    conv('tsa_fusion.sAtt_L3')
    conv('tsa_fusion.sAtt_add_1')
    conv('tsa_fusion.sAtt_add_2')
    # reconstruction + upsample
    for i in range(2):
        resblock(f'recon_trunk.{i}')
    for name in ('upconv1', 'upconv2', 'HRconv', 'conv_last'):
        conv(name)

    got = set(_remap_keys(official, zoo_remaps.remap_edvr))
    # ref_loader stubs the CUDA DCN op, so DCNv2Pack params are absent from
    # the reference state_dict here; their basicsr names are pinned literally
    # (edvr_arch.py:30-50 ModuleDict 'l{1..3}' + cas_dcnpack; DCNv2Pack owns
    # weight/bias/conv_offset.{weight,bias}).
    dcn_expected = set()
    for base in ['pcd_align.dcn_pack.l1', 'pcd_align.dcn_pack.l2',
                 'pcd_align.dcn_pack.l3', 'pcd_align.cas_dcnpack']:
        for leaf in ('weight', 'bias', 'conv_offset.weight', 'conv_offset.bias'):
            dcn_expected.add(f'{base}.{leaf}')
    got_dcn = {k for k in got if 'dcn' in k}
    assert got_dcn == dcn_expected, (sorted(got_dcn - dcn_expected),
                                     sorted(dcn_expected - got_dcn))
    got -= got_dcn
    assert got == target, (sorted(got - target)[:8], sorted(target - got)[:8])


def test_duf_remap_full_key_set():
    m = ref_loader.load_ref_module('basicsr/archs/duf_arch.py')
    net = m.DUF(scale=2, num_layer=16, adapt_official_weights=True)
    target = set(net.state_dict().keys())

    official = []

    def conv(name):
        official.extend([f'{name}.weight', f'{name}.bias'])

    def bn(name):
        official.extend([f'{name}.weight', f'{name}.bias', f'{name}.running_mean',
                         f'{name}.running_var', f'{name}.num_batches_tracked'])

    conv('conv3d_1')
    for blk in ('dense_block_1', 'dense_block_2'):
        for i in range(1, 7):
            bn(f'{blk}.bn3d_{i}')
            conv(f'{blk}.conv3d_{i}')
    bn('bn3d_2')
    conv('conv3d_2')
    conv('conv3d_r1')
    conv('conv3d_r2')
    conv('conv3d_f1')
    conv('conv3d_f2')

    got = set(_remap_keys(official, zoo_remaps.remap_duf_16l))
    assert got == target, (sorted(got - target)[:8], sorted(target - got)[:8])


def test_duf_r2_reorder():
    scale = 2
    w = np.arange(3 * scale**2).astype(np.float32).reshape(-1, 1, 1, 1, 1)
    b = np.arange(3 * scale**2).astype(np.float32)
    w2, b2 = zoo_remaps.reorder_duf_r2(w, b, scale)
    # official interleaves rgb per filter: [r0 g0 b0 r1 g1 b1 ...] ->
    # grouped [r0..r3 g0..g3 b0..b3]
    np.testing.assert_array_equal(b2, [0, 3, 6, 9, 1, 4, 7, 10, 2, 5, 8, 11])
    np.testing.assert_array_equal(w2[:, 0, 0, 0, 0], b2)


def test_ridnet_positional_order_matches_reference():
    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..',
                                'scripts', 'model_conversion'))
    from convert_ridnet import basicsr_ridnet_param_order
    m = ref_loader.load_ref_module('basicsr/archs/ridnet_arch.py')
    net = m.RIDNet(3, 16, 3)  # >= CA squeeze factor, avoids 0-channel convs
    expected = [name for name, _ in net.named_parameters()]
    assert basicsr_ridnet_param_order() == expected


def test_ridnet_positional_remap():
    from collections import OrderedDict
    from convert_ridnet import basicsr_ridnet_param_order
    names = basicsr_ridnet_param_order()
    official = OrderedDict((f'opaque_{i}', np.float32(i)) for i in range(len(names)))
    out = zoo_remaps.remap_ridnet_positional(official, names)
    assert list(out.keys()) == names
    assert out[names[5]] == np.float32(5)
    with pytest.raises(ValueError):
        zoo_remaps.remap_ridnet_positional(official, names[:-1])


def test_stylegan2_remap_samples():
    m = ref_loader.load_ref_module('basicsr/archs/stylegan2_arch.py')
    g = m.StyleGAN2Generator(out_size=64, num_style_feat=32, num_mlp=2,
                             channel_multiplier=1)
    g_keys = set(g.state_dict().keys())
    cases = {
        'style.1.weight': 'style_mlp.1.weight',
        'input.input': 'constant_input.weight',
        'conv1.conv.weight': 'style_conv1.modulated_conv.weight',
        'conv1.conv.modulation.weight': 'style_conv1.modulated_conv.modulation.weight',
        'conv1.activate.bias': 'style_conv1.activate.bias',
        'convs.0.conv.weight': 'style_convs.0.modulated_conv.weight',
        'to_rgb1.conv.modulation.bias': 'to_rgb1.modulated_conv.modulation.bias',
        'to_rgbs.1.conv.weight': 'to_rgbs.1.modulated_conv.weight',
        'noises.noise_0': 'noises.noise0',
    }
    for ori, want in cases.items():
        got = zoo_remaps.remap_stylegan2_g(ori, (2, 2))
        assert got == want, (ori, got, want)
        assert want in g_keys, want
    # noise-strength weights disambiguated by scalar shape
    assert (zoo_remaps.remap_stylegan2_g('convs.0.noise.weight', (1,))
            == 'style_convs.0.weight')
    assert 'style_convs.0.weight' in g_keys

    d = m.StyleGAN2Discriminator(out_size=64, channel_multiplier=1)
    d_keys = set(d.state_dict().keys())
    assert zoo_remaps.remap_stylegan2_d('convs.1.conv1.0.weight') == 'conv_body.1.conv1.0.weight'
    assert any(k.startswith('conv_body.1.') for k in d_keys)
    assert zoo_remaps.remap_stylegan2_d('final_linear.0.weight') == 'final_linear.0.weight'


def test_dfdnet_remap_samples():
    cases = {
        'le.64.0.weight': 'attn_blocks.left_eye.64.0.weight',
        're.128.1.bias': 'attn_blocks.right_eye.128.1.bias',
        'mo.256.0.weight': 'attn_blocks.mouth.256.0.weight',
        'no.512.2.weight': 'attn_blocks.nose.512.2.weight',
        'MSDilate.conv1.0.weight': 'multi_scale_dilation.conv_blocks.0.0.weight',
        'MSDilate.convi.weight': 'multi_scale_dilation.conv_fusion.weight',
        'VggExtract.RGB_mean': 'vgg_extractor.mean',
        'VggExtract.model.features.0.weight': 'vgg_extractor.vgg_net.features.0.weight',
        'up1.model.0.weight': 'up1.model.0.weight',
    }
    for ori, want in cases.items():
        got = zoo_remaps.remap_dfdnet(ori)
        assert got == want, (ori, got, want)
