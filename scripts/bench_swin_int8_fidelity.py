"""Output fidelity of the W8A8 fused Swin joint kernel (VERDICT r3 #2) on
real image statistics: PSNR between the bf16 and int8 SwinIR-M x4 outputs
on tests/data crops (no pretrained weights in this environment, so the
measurable quantity is kernel quantization noise at random init — the
weight/activation distributions the per-channel & per-tile scales see).

    python scripts/bench_swin_int8_fidelity.py

Prints one JSON line {"psnr_db": ..., "maxerr": ..., "range": ...}.
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from basicsr4rs_tpu.ops.quant import quantized_inference

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    imgs = []
    for p in ([os.path.join(root, 'tests/data/baboon.png')]
              + sorted(glob.glob(os.path.join(root, 'tests/data/gt/*.png')))):
        im = cv2.imread(p)
        if im is None:
            continue
        im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.
        if im.shape[0] >= 64 and im.shape[1] >= 64:
            imgs.append(im[:64, :64])
        if len(imgs) >= 4:
            break
    assert imgs, 'no test images found'
    x = jnp.asarray(np.stack(imgs))

    net = bench._build(bench._swinir_opt(True))
    params = bench._jit_init(net.init)(jax.random.PRNGKey(0), x)['params']
    fp_out = np.asarray(jax.jit(
        lambda p, xx: net.apply({'params': p}, xx))(params, x))

    @jax.jit
    def q_apply(p, xx):
        with quantized_inference(min_channels=10**9, swin_kernels=True):
            return net.apply({'params': p}, xx)

    q_out = np.asarray(q_apply(params, x))
    err = q_out.astype(np.float64) - fp_out.astype(np.float64)
    rng = float(fp_out.max() - fp_out.min())
    psnr = 10 * np.log10(rng ** 2 / (float((err ** 2).mean()) + 1e-20))
    print(json.dumps({'psnr_db': round(psnr, 2),
                      'maxerr': round(float(np.abs(err).max()), 5),
                      'range': round(rng, 4)}), flush=True)


if __name__ == '__main__':
    main()
