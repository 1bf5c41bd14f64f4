"""AOT export + serving runtime via ``jax.export`` (StableHLO).

The reference serves models by running the torch module inside a Python
process per request (`inference/*.py`); there is no ahead-of-time story.
On TPU the natural production path is different: lower the jitted forward
ONCE per input-shape bucket, serialize the StableHLO (weights embedded as
constants), and serve by deserializing + calling — no Python model code,
no flax, no registry, and no retrace at serving time. The serialized
artifact is also the unit of deployment: it can be shipped to a serving
fleet and executed by any JAX runtime of a compatible version (and, for
`platforms=['tpu']` exports, compiled on the target chip at load).

Arbitrary request sizes are handled the way `SwinIRModel.test` handles
window alignment (models/swinir_model.py): each export is a static
(batch, H, W) *bucket*; a request is reflect-padded up to the smallest
bucket that fits and the output cropped back to ``h*scale, w*scale``.
Bucket-exact requests are bit-identical to the live ``net.apply``.

Artifact layout (one directory per exported model)::

    manifest.json                     # scale, in_chans, dtype, buckets, meta
    net_{H}x{W}_b{B}.shlo             # jax.export serialized bytes per bucket

Used by ``scripts/export_serving.py`` (CLI) and tested CPU-only in
``tests/test_utils/test_serving.py``.
"""

from __future__ import annotations

import json
import os
from os import path as osp

import numpy as np

__all__ = ['export_network', 'save_serving_dir', 'ServingModel']

_MANIFEST = 'manifest.json'


def _bucket_name(h: int, w: int, b: int) -> str:
    return f'net_{h}x{w}_b{b}.shlo'


def export_network(net, params, batch: int, height: int, width: int,
                   in_chans: int = 3, dtype=None, platforms=None,
                   quant_act_scales=None):
    """Export ``net.apply({'params': params}, x)`` for one static NHWC shape.

    Weights are captured as constants inside the artifact. ``platforms``
    follows `jax.export` semantics (None = current backend; e.g.
    ``['tpu']`` to lower for TPU from a CPU host). ``quant_act_scales``
    (from ``ops.quant.calibrate_act_scales``) bakes the W8A8 int8 serving
    mode into the artifact — the exported StableHLO carries int8 weights
    and static requant chains.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    dtype = dtype or jnp.float32

    def fwd(x):
        if quant_act_scales is not None:
            from ..ops.quant import quantized_inference
            with quantized_inference(act_scales=quant_act_scales):
                return net.apply({'params': params}, x)
        return net.apply({'params': params}, x)

    spec = jax.ShapeDtypeStruct((batch, height, width, in_chans), dtype)
    kwargs = {}
    if platforms is not None:
        kwargs['platforms'] = list(platforms)
    return jexport.export(jax.jit(fwd), **kwargs)(spec)


def save_serving_dir(out_dir: str, net, params, buckets, *, scale: int,
                     in_chans: int = 3, batch: int = 1, dtype=None,
                     pad_multiple: int = 1, platforms=None, meta=None,
                     quant_act_scales=None) -> dict:
    """Export every (H, W) bucket and write the serving directory.

    ``pad_multiple`` records the arch's alignment requirement (e.g. SwinIR's
    window_size) so bucket validation can enforce it. Returns the manifest.
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    os.makedirs(out_dir, exist_ok=True)
    entries = []
    for h, w in buckets:
        if h % pad_multiple or w % pad_multiple:
            raise ValueError(f'bucket {h}x{w} not a multiple of {pad_multiple}')
        exported = export_network(net, params, batch, h, w, in_chans=in_chans,
                                  dtype=dtype, platforms=platforms,
                                  quant_act_scales=quant_act_scales)
        fname = _bucket_name(h, w, batch)
        with open(osp.join(out_dir, fname), 'wb') as f:
            f.write(exported.serialize())
        entries.append({'h': h, 'w': w, 'batch': batch, 'file': fname})
    manifest = {
        'scale': scale,
        'in_chans': in_chans,
        'dtype': jnp.dtype(dtype).name,
        'pad_multiple': pad_multiple,
        'quant': 'int8-static' if quant_act_scales is not None else None,
        'buckets': sorted(entries, key=lambda e: e['h'] * e['w']),
        'meta': meta or {},
    }
    with open(osp.join(out_dir, _MANIFEST), 'w') as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ServingModel:
    """Serve a directory written by :func:`save_serving_dir`.

    ``run(x)`` takes NHWC float input (numpy or jax), picks the smallest
    bucket that fits, reflect-pads (same convention as
    ``models/swinir_model.py pad_to_multiple``), executes the exported
    computation, and crops the output back to ``(h*scale, w*scale)``.
    """

    def __init__(self, model_dir: str):
        from jax import export as jexport

        with open(osp.join(model_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self.scale = int(self.manifest['scale'])
        self.in_chans = int(self.manifest['in_chans'])
        self._fns = []
        for e in self.manifest['buckets']:
            with open(osp.join(model_dir, e['file']), 'rb') as f:
                exported = jexport.deserialize(f.read())
            self._fns.append((int(e['h']), int(e['w']), int(e['batch']),
                              exported))

    @property
    def buckets(self):
        return [(h, w) for h, w, _, _ in self._fns]

    def _pick(self, h: int, w: int):
        for bh, bw, bb, fn in self._fns:   # sorted by area at save time
            if bh >= h and bw >= w:
                return bh, bw, bb, fn
        raise ValueError(
            f'no bucket fits {h}x{w}; available: {self.buckets}')

    def run(self, x):
        import jax.numpy as jnp

        x = jnp.asarray(x)
        if x.ndim == 3:
            x = x[None]
        b, h, w, c = x.shape
        if c != self.in_chans:
            raise ValueError(f'expected {self.in_chans} channels, got {c}')
        bh, bw, bb, fn = self._pick(h, w)
        if b > bb:
            raise ValueError(f'batch {b} exceeds exported batch {bb}')
        pads = ((0, bb - b), (0, bh - h), (0, bw - w), (0, 0))
        if bh - h >= h or bw - w >= w:
            raise ValueError(
                f'bucket {bh}x{bw} pads {h}x{w} beyond reflect limits; '
                'export a closer bucket')
        xp = jnp.pad(x, ((0, 0),) + pads[1:3] + ((0, 0),), mode='reflect')
        if bb - b:
            xp = jnp.pad(xp, (pads[0],) + ((0, 0),) * 3)
        out = fn.call(xp.astype(self.manifest['dtype']))
        s = self.scale
        return np.asarray(out[:b, :h * s, :w * s])
