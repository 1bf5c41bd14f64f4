"""AOT export/serving roundtrip (utils/serving.py).

The exported StableHLO must reproduce the live ``net.apply`` bit-exactly on
bucket-exact inputs, survive a disk roundtrip, and handle off-bucket
requests via the reflect-pad + crop convention (same as
models/swinir_model.py pad/crop eval)."""

import numpy as np
import pytest


@pytest.fixture(scope='module')
def small_net():
    import jax

    from basicsr4rs_tpu.archs import build_network
    net = build_network(dict(type='MSRResNet', num_in_ch=3, num_out_ch=3,
                             num_feat=8, num_block=1, upscale=4))
    import jax.numpy as jnp
    x0 = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0)['params']
    return net, params


def _save(tmpdir, net, params, buckets, batch=1, pad_multiple=1):
    from basicsr4rs_tpu.utils.serving import save_serving_dir
    return save_serving_dir(str(tmpdir), net, params, buckets, scale=4,
                            in_chans=3, batch=batch,
                            pad_multiple=pad_multiple,
                            meta={'network': 'MSRResNet'})


def test_bucket_exact_bitmatch(tmp_path, small_net):
    net, params = small_net
    _save(tmp_path, net, params, [(16, 16)])

    from basicsr4rs_tpu.utils.serving import ServingModel
    sm = ServingModel(str(tmp_path))
    x = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    got = sm.run(x)
    want = np.asarray(net.apply({'params': params}, x))
    assert got.shape == (1, 64, 64, 3)
    np.testing.assert_array_equal(got, want)


def test_offbucket_pad_crop(tmp_path, small_net):
    """An 11x13 request lands in the 16x16 bucket; the result must equal
    running the live net on the same reflect-padded input, cropped."""
    import jax.numpy as jnp

    net, params = small_net
    _save(tmp_path, net, params, [(16, 16), (32, 32)])

    from basicsr4rs_tpu.utils.serving import ServingModel
    sm = ServingModel(str(tmp_path))
    assert sm.buckets == [(16, 16), (32, 32)]

    x = np.random.RandomState(1).rand(1, 11, 13, 3).astype(np.float32)
    got = sm.run(x)
    xp = jnp.pad(jnp.asarray(x), ((0, 0), (0, 5), (0, 3), (0, 0)),
                 mode='reflect')
    want = np.asarray(net.apply({'params': params}, xp))[:, :44, :52]
    assert got.shape == (1, 44, 52, 3)
    np.testing.assert_array_equal(got, want)

    # 17x17 must escalate to the 32x32 bucket
    x2 = np.random.RandomState(2).rand(17, 17, 3).astype(np.float32)
    got2 = sm.run(x2)   # HWC input also accepted
    assert got2.shape == (1, 68, 68, 3)


def test_no_fitting_bucket_raises(tmp_path, small_net):
    net, params = small_net
    _save(tmp_path, net, params, [(16, 16)])
    from basicsr4rs_tpu.utils.serving import ServingModel
    sm = ServingModel(str(tmp_path))
    with pytest.raises(ValueError, match='no bucket fits'):
        sm.run(np.zeros((1, 40, 40, 3), np.float32))
    with pytest.raises(ValueError, match='channels'):
        sm.run(np.zeros((1, 16, 16, 4), np.float32))


def test_pad_multiple_validation(tmp_path, small_net):
    net, params = small_net
    with pytest.raises(ValueError, match='multiple'):
        _save(tmp_path, net, params, [(15, 16)], pad_multiple=8)


def test_batch_padding(tmp_path, small_net):
    """Exports at batch 4; a batch-2 request is zero-padded on the batch
    axis and cropped back (per-sample convs make pad samples inert)."""
    net, params = small_net
    _save(tmp_path, net, params, [(16, 16)], batch=4)
    from basicsr4rs_tpu.utils.serving import ServingModel
    sm = ServingModel(str(tmp_path))
    x = np.random.RandomState(3).rand(2, 16, 16, 3).astype(np.float32)
    got = sm.run(x)
    want = np.asarray(net.apply({'params': params}, x))
    assert got.shape == (2, 64, 64, 3)
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match='batch'):
        sm.run(np.zeros((5, 16, 16, 3), np.float32))


def test_int8_export_roundtrip(tmp_path, small_net):
    """--int8 export: the artifact bakes the W8A8 static-scale mode and
    bit-matches the live quantized apply on a bucket-exact input."""
    import jax
    import jax.numpy as jnp

    from basicsr4rs_tpu.archs import build_network
    from basicsr4rs_tpu.ops.quant import (calibrate_act_scales,
                                          quantized_inference)
    from basicsr4rs_tpu.utils.serving import ServingModel, save_serving_dir

    # needs channels >= the quantizer's min_channels eligibility bar
    net = build_network(dict(type='MSRResNet', num_in_ch=3, num_out_ch=3,
                             num_feat=16, num_block=1, upscale=4))
    x = jnp.asarray(np.random.RandomState(1).rand(1, 16, 16, 3),
                    jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)['params']
    scales = calibrate_act_scales(
        lambda b: net.apply({'params': params}, b), [x])
    manifest = save_serving_dir(str(tmp_path), net, params, [(16, 16)],
                                scale=4, in_chans=3,
                                quant_act_scales=scales)
    assert manifest['quant'] == 'int8-static'

    sm = ServingModel(str(tmp_path))
    got = sm.run(np.asarray(x))
    with quantized_inference(act_scales=scales):
        want = np.asarray(net.apply({'params': params}, x))
    # not bit-exact: XLA may reassociate the f32 dequant chain differently
    # in the exported artifact, flipping the odd value by ~1 ulp
    np.testing.assert_allclose(got, want, atol=1e-9, rtol=1e-6)
    # and the int8 artifact differs from the fp forward (mode engaged)
    fp = np.asarray(net.apply({'params': params}, x))
    assert not np.array_equal(got, fp)
