"""Export a restoration network for production serving (AOT StableHLO).

Lowers the jitted forward once per input-shape bucket and writes a serving
directory (`utils/serving.py` layout: manifest.json + per-bucket .shlo
artifacts with the weights embedded). The artifact needs no Python model
code at serving time — deserialize and call.

Example:
    python scripts/export_serving.py -opt options/test/SRResNet_SRGAN/test_MSRResNet_x4.yml \
        --model_path experiments/.../net_g_latest.pth \
        --buckets 64x64,128x128,256x256 --out serving/msrresnet_x4

    # serve:
    from basicsr4rs_tpu.utils.serving import ServingModel
    out = ServingModel('serving/msrresnet_x4').run(lq_nhwc)
"""

import argparse
import sys
from os import path as osp

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('-opt', required=True, help='test YAML naming network_g')
    p.add_argument('--model_path', default=None,
                   help='.pth / orbax checkpoint (default: random init)')
    p.add_argument('--buckets', default='64x64,128x128,256x256',
                   help='comma-separated HxW input buckets')
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--out', required=True, help='output serving directory')
    p.add_argument('--platforms', default=None,
                   help="comma list for cross-platform lowering, e.g. 'tpu'")
    p.add_argument('--dtype', default='float32',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--int8', action='store_true',
                   help='bake the W8A8 int8 serving mode into the artifact '
                        '(ops/quant.py; static activation scales)')
    p.add_argument('--calib', default=None,
                   help='NHWC .npy batch for int8 calibration (default: '
                        'uniform random at the first bucket shape)')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from basicsr4rs_tpu.archs import build_network
    from basicsr4rs_tpu.utils.options import yaml_load

    opt = yaml_load(args.opt)
    net_opt = dict(opt['network_g'])
    net = build_network(net_opt)
    in_chans = net_opt.get('in_chans', net_opt.get('num_in_ch', 3))
    scale = int(opt.get('scale', net_opt.get('upscale', net_opt.get('scale', 1))))
    pad_multiple = int(net_opt.get('window_size', 1))

    buckets = []
    for tok in args.buckets.split(','):
        h, w = tok.lower().split('x')
        buckets.append((int(h), int(w)))

    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    if args.model_path:
        sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)),
                                    '..', 'inference'))
        from inference_esrgan import load_params
        params = load_params(args.model_path, net)
    else:
        x0 = jnp.zeros((1, buckets[0][0], buckets[0][1], in_chans), dtype)
        params = net.init(jax.random.PRNGKey(0), x0)['params']
        print('WARNING: no --model_path; exporting RANDOM weights')

    scales = None
    if args.int8:
        import numpy as np
        from basicsr4rs_tpu.ops.quant import calibrate_act_scales
        if args.calib:
            calib = jnp.asarray(np.load(args.calib), dtype)
        else:
            print('WARNING: no --calib; calibrating int8 scales on uniform '
                  'random input')
            calib = jax.random.uniform(
                jax.random.PRNGKey(0),
                (args.batch, buckets[0][0], buckets[0][1], in_chans), dtype)
        scales = calibrate_act_scales(
            lambda b: net.apply({'params': params}, b), [calib])
        print(f'int8: calibrated {len(scales)} conv sites')

    from basicsr4rs_tpu.utils.serving import save_serving_dir
    platforms = args.platforms.split(',') if args.platforms else None
    manifest = save_serving_dir(
        args.out, net, params, buckets, scale=scale, in_chans=in_chans,
        batch=args.batch, dtype=dtype, pad_multiple=pad_multiple,
        platforms=platforms, quant_act_scales=scales,
        meta={'network': net_opt.get('type'), 'opt': args.opt})
    print(f'exported {len(manifest["buckets"])} buckets -> {args.out}')


if __name__ == '__main__':
    main()
