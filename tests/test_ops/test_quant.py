"""Int8 PTQ inference (ops/quant.py): numerics of the W8A8 conv, the
interception contract (what is and is not rewritten), and end-to-end
accuracy bounds on real registered archs."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basicsr4rs_tpu.ops.quant import (int8_conv2d, quantize_act_int8,
                                      quantize_weight_int8,
                                      quantized_inference)


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(test, np.float64) - ref
    return 10 * np.log10(np.sum(ref**2) / max(np.sum(err**2), 1e-30))


def test_weight_quant_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 32, 64)) * 0.05
    wq, s = quantize_weight_int8(w, (0, 1, 2))
    assert wq.dtype == jnp.int8 and s.shape == (64,)
    deq = wq.astype(np.float32) * np.asarray(s)
    # absmax symmetric: max error is half a quantization step per channel
    step = np.asarray(s)
    assert np.all(np.abs(np.asarray(w) - deq) <= 0.5 * step + 1e-7)


def test_act_quant_scalar_scale():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    xq, s = quantize_act_int8(x)
    assert xq.dtype == jnp.int8 and np.ndim(s) == 0
    assert np.max(np.abs(np.asarray(xq))) <= 127


def test_int8_conv_matches_f32_conv():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(k1, (2, 16, 16, 32))
    w = jax.random.normal(k2, (3, 3, 32, 32)) * 0.05
    b = jax.random.normal(k3, (32,)) * 0.1
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    ref = jax.lax.conv_general_dilated(x, w, (1, 1), 'SAME',
                                       dimension_numbers=dn) + b
    got = int8_conv2d(x, w, b, (1, 1), 'SAME')
    assert snr_db(ref, got) > 35.0  # ~6 effective bits of conv SNR


class _TwoConv(nn.Module):
    feats: int = 32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.feats, (3, 3), name='c1')(x)
        x = nn.relu(x)
        return nn.Conv(3, (3, 3), name='c2')(x)


def test_interception_rewrites_eligible_and_skips_boundary():
    net = _TwoConv()
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 16))
    params = net.init(jax.random.PRNGKey(4), x)
    ref = net.apply(params, x)
    with quantized_inference(min_channels=16):
        q = net.apply(params, x)
    # c1 (16->32) quantized: output differs; c2 (32->3) skipped
    assert not np.allclose(np.asarray(ref), np.asarray(q))
    assert snr_db(ref, q) > 30.0
    # raise the bar: nothing eligible -> bit-identical to the f32 path
    with quantized_inference(min_channels=64):
        same = net.apply(params, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(same))


def test_interception_inside_jit():
    net = _TwoConv()
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 16, 16, 16))
    params = net.init(jax.random.PRNGKey(6), x)

    @jax.jit
    def quant_fwd(p, x):
        with quantized_inference(min_channels=16):
            return net.apply(p, x)

    ref = net.apply(params, x)
    assert snr_db(ref, quant_fwd(params, x)) > 30.0


def test_grouped_and_dilated_convs_not_rewritten():
    class G(nn.Module):
        @nn.compact
        def __call__(self, x):
            a = nn.Conv(32, (3, 3), feature_group_count=2, name='g')(x)
            b = nn.Conv(32, (3, 3), kernel_dilation=(2, 2), name='d')(x)
            return a + b

    net = G()
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 12, 12, 32))
    params = net.init(jax.random.PRNGKey(8), x)
    ref = net.apply(params, x)
    with quantized_inference():
        q = net.apply(params, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(q))


def test_static_scales_calibrate_and_match_dynamic():
    """calibrate_act_scales records every eligible site; static inference
    stays close to dynamic (same quant grid when the eval batch == the
    calibration batch), and unseen sites fall back to full precision."""
    from basicsr4rs_tpu.ops.quant import calibrate_act_scales
    net = _TwoConv()
    x = jax.random.uniform(jax.random.PRNGKey(11), (1, 16, 16, 16))
    params = net.init(jax.random.PRNGKey(12), x)
    scales = calibrate_act_scales(lambda b: net.apply(params, b), [x],
                                  min_channels=16)
    assert len(scales) == 1 and all(v > 0 for v in scales.values())

    ref = net.apply(params, x)
    with quantized_inference(min_channels=16, act_scales=scales):
        q_static = net.apply(params, x)
    assert snr_db(ref, q_static) > 30.0
    # scales for a DIFFERENT module: every site unseen -> fp fallback
    with quantized_inference(min_channels=16,
                             act_scales={('nope',): 1.0}):
        same = net.apply(params, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(same))


@pytest.mark.parametrize('arch_opt,lr_shape', [
    (dict(type='MSRResNet', num_in_ch=3, num_out_ch=3, num_feat=32,
          num_block=4, upscale=4), (1, 24, 24, 3)),
    (dict(type='RRDBNet', num_in_ch=3, num_out_ch=3, num_feat=32,
          num_grow_ch=16, num_block=2, scale=4), (1, 24, 24, 3)),
])
def test_arch_level_accuracy(arch_opt, lr_shape):
    """Real registered archs: int8 eval tracks the f32 eval closely on
    [0,1] image inputs (the PTQ quality bound the serving mode relies on)."""
    from basicsr4rs_tpu.archs import build_network
    net = build_network(dict(arch_opt))
    x = jax.random.uniform(jax.random.PRNGKey(9), lr_shape)
    params = net.init(jax.random.PRNGKey(10), x)
    ref = net.apply(params, x)
    with quantized_inference():
        q = net.apply(params, x)
    assert snr_db(ref, q) > 28.0, f'int8 SNR too low: {snr_db(ref, q):.1f} dB'


@pytest.mark.parametrize('mode', [True, 'static'])
def test_sr_model_val_flag(tmp_path, mode):
    """val.quant_int8 routes SRModel eval through the int8 path
    (True = dynamic scales, 'static' = first-batch calibration)."""
    from basicsr4rs_tpu.models import build_model
    opt = {
        'name': 'debug_quant', 'model_type': 'SRModel', 'scale': 4,
        'num_gpu': 0, 'is_train': False, 'dist': False, 'rank': 0,
        'world_size': 1, 'manual_seed': 0,
        'network_g': dict(type='MSRResNet', num_in_ch=3, num_out_ch=3,
                          num_feat=32, num_block=2, upscale=4),
        'path': {'models': str(tmp_path), 'log': str(tmp_path),
                 'visualization': str(tmp_path)},
        'val': {'quant_int8': mode},
    }
    model = build_model(opt)
    lq = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3),
                     jnp.float32)
    model.feed_data({'lq': lq})
    model.test()
    out_q = np.asarray(model.output)

    opt2 = dict(opt, val={})
    opt2['name'] = 'debug_quant_f32'
    model2 = build_model(opt2)
    # same init seed -> same params
    model2.state = model2.state.replace(params=model.state.params)
    model2.feed_data({'lq': lq})
    model2.test()
    out_f = np.asarray(model2.output)
    assert out_q.shape == out_f.shape
    assert not np.allclose(out_q, out_f)     # int8 path actually engaged
    assert snr_db(out_f, out_q) > 28.0


def test_calibration_skips_scanned_convs():
    """Recurrent trunks run their convs inside nn.scan, whose body is
    traced even under an eager apply — those sites can't be calibrated
    and must be skipped (staying fp under static scales) instead of
    raising ConcretizationTypeError."""
    from basicsr4rs_tpu.archs import build_network
    from basicsr4rs_tpu.ops.quant import calibrate_act_scales

    net = build_network(dict(type='BasicVSR', num_feat=64, num_block=1))
    calib = jax.random.uniform(jax.random.PRNGKey(2), (1, 2, 64, 64, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(1), calib)
    scales = calibrate_act_scales(lambda v: net.apply(params, v), [calib])
    # the non-scanned sites (SpyNet pyramid, fusion/upsample convs) record;
    # no scanned trunk path appears
    assert len(scales) > 0
    assert not any('trunk' in '/'.join(p) for p in scales)
    # static inference with these scales runs (scanned convs fp, rest int8)
    from basicsr4rs_tpu.ops.quant import quantized_inference
    ref = net.apply(params, calib)
    with quantized_inference(act_scales=scales):
        q = net.apply(params, calib)
    assert q.shape == ref.shape
    assert snr_db(ref, q) > 25.0
