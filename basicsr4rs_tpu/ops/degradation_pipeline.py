"""Jit-compiled Real-ESRGAN two-stage degradation synthesis.

Reference behavior: basicsr/models/realesrgan_model.py:68-185 (eager GPU ops
with dynamic intermediate sizes). TPU-native re-design: every step is traced
into ONE XLA program with **static canvas shapes** and *traced* continuous
resize factors via ``jax.image.scale_and_translate``:

  * stage-1 random resize renders the f-scaled image into the top-left of a
    fixed canvas of size ceil(ori * resize_range[1]); the valid extent is a
    traced integer and the background is masked to zero,
  * noise is elementwise (canvas-safe); JPEG runs on the canvas — only the
    8px boundary blocks of the valid region see the zero background, the
    same class of boundary effect the reference gets from JPEG zero-padding,
  * stage-2 resize maps the traced valid region onto a second fixed canvas,
    and the final resize lands on the exact static LQ size before the sinc
    filter and clamp/round.

Batch-level choices (up/down/keep, interp mode, gaussian-vs-poisson, blur2,
jpeg/sinc order) are traced scalars driving ``lax.switch``/``lax.cond``,
matching the reference's per-batch python sampling; sigmas/qualities are
per-sample.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..utils.diffjpeg import DiffJPEG
from ..utils.img_process_util import USMSharp, filter2D
from ..data.degradations import random_add_gaussian_noise_jax, random_add_poisson_noise_jax


def _valid_mask(shape, vh, vw, dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, shape[1:3], 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape[1:3], 1)
    return ((rows < vh) & (cols < vw)).astype(dtype)[None, :, :, None]


def _resize_traced(img, out_shape_hw, in_valid, out_valid, method_idx):
    """scale_and_translate resize with traced scale; method chosen by
    lax.switch: 0=area(linear+antialias), 1=bilinear, 2=bicubic."""
    n, _, _, c = img.shape
    oh, ow = out_shape_hw
    scale = jnp.stack([out_valid[0] / in_valid[0], out_valid[1] / in_valid[1]]).astype(jnp.float32)
    translation = jnp.zeros((2,), jnp.float32)

    def do(method, antialias):
        return jax.image.scale_and_translate(
            img, (n, oh, ow, c), (1, 2), scale, translation, method=method, antialias=antialias)

    out = jax.lax.switch(method_idx, [
        lambda: do('linear', True),
        lambda: do('linear', False),
        lambda: do('cubic', False),
    ])
    return out * _valid_mask(out.shape, out_valid[0], out_valid[1], out.dtype)


class RealESRGANDegrader:
    """Callable (key, gt, kernel1, kernel2, sinc_kernel) -> (lq, gt). Pure —
    jit it (the model jits it together with the crop)."""

    def __init__(self, opt: Dict[str, Any]):
        self.opt = opt
        self.scale = opt['scale']
        self.jpeger = DiffJPEG(differentiable=False)
        self.usm = USMSharp()

    def __call__(self, key, gt, kernel1, kernel2, sinc_kernel):
        o = self.opt
        n, ori_h, ori_w, c = gt.shape
        assert ori_h == ori_w, 'square crop_pad_size expected'
        ori = ori_h
        sf = self.scale

        keys = list(jax.random.split(key, 24))
        nk = iter(keys).__next__

        gt_usm = self.usm(gt)

        # ---------------- stage 1 ----------------
        out = filter2D(gt_usm, kernel1)

        # random resize (reference :86-96)
        r1 = o['resize_range']
        canvas1 = int(math.ceil(ori * r1[1]))
        u = jax.random.choice(nk(), 3, p=jnp.asarray(o['resize_prob']))
        s1 = jax.lax.switch(u, [
            lambda k: jax.random.uniform(k, (), jnp.float32, 1., r1[1]),
            lambda k: jax.random.uniform(k, (), jnp.float32, r1[0], 1.),
            lambda k: jnp.float32(1.),
        ], nk())
        valid1 = jnp.floor(ori * s1).astype(jnp.int32)
        method1 = jax.random.randint(nk(), (), 0, 3)
        out = _resize_traced(out, (canvas1, canvas1), (jnp.float32(ori), jnp.float32(ori)),
                             (valid1.astype(jnp.float32), valid1.astype(jnp.float32)), method1)

        # noise (reference :97-109)
        use_gauss = jax.random.uniform(nk(), ()) < o['gaussian_noise_prob']
        kg, kp = nk(), nk()
        out = jax.lax.cond(
            use_gauss,
            lambda img: random_add_gaussian_noise_jax(kg, img, o['noise_range'],
                                                      o['gray_noise_prob'], clip=True),
            lambda img: random_add_poisson_noise_jax(kp, img, o['poisson_scale_range'],
                                                     o['gray_noise_prob'], clip=True),
            out)
        # JPEG (reference :110-113)
        jpeg_q = jax.random.uniform(nk(), (n,), jnp.float32, o['jpeg_range'][0], o['jpeg_range'][1])
        out = jnp.clip(out, 0, 1) * _valid_mask(out.shape, valid1, valid1, out.dtype)
        out = self.jpeger(out, jpeg_q)

        # ---------------- stage 2 ----------------
        do_blur2 = jax.random.uniform(nk(), ()) < o['second_blur_prob']
        blurred2 = filter2D(out, kernel2)
        out = jnp.where(do_blur2, blurred2, out)

        r2 = o['resize_range2']
        base2 = ori / sf
        canvas2 = int(math.ceil(base2 * r2[1]))
        u2 = jax.random.choice(nk(), 3, p=jnp.asarray(o['resize_prob2']))
        s2 = jax.lax.switch(u2, [
            lambda k: jax.random.uniform(k, (), jnp.float32, 1., r2[1]),
            lambda k: jax.random.uniform(k, (), jnp.float32, r2[0], 1.),
            lambda k: jnp.float32(1.),
        ], nk())
        valid2 = jnp.floor(base2 * s2).astype(jnp.int32)
        method2 = jax.random.randint(nk(), (), 0, 3)
        out = _resize_traced(out, (canvas2, canvas2),
                             (valid1.astype(jnp.float32), valid1.astype(jnp.float32)),
                             (valid2.astype(jnp.float32), valid2.astype(jnp.float32)), method2)

        use_gauss2 = jax.random.uniform(nk(), ()) < o['gaussian_noise_prob2']
        kg2, kp2 = nk(), nk()
        out = jax.lax.cond(
            use_gauss2,
            lambda img: random_add_gaussian_noise_jax(kg2, img, o['noise_range2'],
                                                      o['gray_noise_prob2'], clip=True),
            lambda img: random_add_poisson_noise_jax(kp2, img, o['poisson_scale_range2'],
                                                     o['gray_noise_prob2'], clip=True),
            out)

        # final [resize + sinc] / JPEG in random order (reference :142-169)
        lq_size = ori // sf
        method3 = jax.random.randint(nk(), (), 0, 3)
        jpeg_q2 = jax.random.uniform(nk(), (n,), jnp.float32, o['jpeg_range2'][0], o['jpeg_range2'][1])

        def resize_final(img):
            return _resize_traced(img, (lq_size, lq_size),
                                  (valid2.astype(jnp.float32), valid2.astype(jnp.float32)),
                                  (jnp.float32(lq_size), jnp.float32(lq_size)), method3)

        def order_a(img):  # resize + sinc, then JPEG
            img = filter2D(resize_final(img), sinc_kernel)
            return self.jpeger(jnp.clip(img, 0, 1), jpeg_q2)

        def order_b(img):  # JPEG, then resize + sinc
            img = self.jpeger(jnp.clip(img, 0, 1) * _valid_mask(img.shape, valid2, valid2, img.dtype),
                              jpeg_q2)
            return filter2D(resize_final(img), sinc_kernel)

        out = jax.lax.cond(jax.random.uniform(nk(), ()) < 0.5, order_a, order_b, out)

        # clamp & round (reference :171)
        lq = jnp.clip((out * 255.0).round(), 0, 255) / 255.
        return lq, gt, gt_usm


def paired_random_crop_traced(key, gts, lq, gt_size: int, scale: int):
    """Random aligned crop with traced offsets (gts may be a list)."""
    n, lh, lw, c = lq.shape
    lq_size = gt_size // scale
    kt, kl = jax.random.split(key)
    top = jax.random.randint(kt, (), 0, lh - lq_size + 1)
    left = jax.random.randint(kl, (), 0, lw - lq_size + 1)
    lq_crop = jax.lax.dynamic_slice(lq, (0, top, left, 0), (n, lq_size, lq_size, c))
    single = not isinstance(gts, (list, tuple))
    gt_list = [gts] if single else list(gts)
    out = [jax.lax.dynamic_slice(g, (0, top * scale, left * scale, 0),
                                 (g.shape[0], gt_size, gt_size, g.shape[3])) for g in gt_list]
    return (out[0] if single else out), lq_crop


class TrainingPairPool:
    """Device-side FIFO pool with shuffle on dequeue
    (reference _dequeue_and_enqueue, realesrgan_model.py:32-66).

    State is a pytree (lq_pool, gt_pool, ptr) threaded through the jitted
    update; behaves like the reference: enqueue-only until full, then
    permute-the-pool / swap-in-current-batch."""

    def __init__(self, queue_size: int, lq_shape, gt_shape):
        self.queue_size = queue_size
        self.lq_shape = lq_shape
        self.gt_shape = gt_shape

    def init_state(self):
        return {'lq': jnp.zeros((self.queue_size,) + tuple(self.lq_shape), jnp.float32),
                'gt': jnp.zeros((self.queue_size,) + tuple(self.gt_shape), jnp.float32),
                'ptr': jnp.zeros((), jnp.int32)}

    def update(self, key, state, lq, gt):
        b = lq.shape[0]
        qs = self.queue_size
        assert qs % b == 0, f'queue size {qs} should be divisible by batch size {b}'

        def full(_):
            perm = jax.random.permutation(key, qs)
            lq_pool = state['lq'][perm]
            gt_pool = state['gt'][perm]
            lq_out = lq_pool[:b]
            gt_out = gt_pool[:b]
            lq_pool = jax.lax.dynamic_update_slice(lq_pool, lq, (0, 0, 0, 0))
            gt_pool = jax.lax.dynamic_update_slice(gt_pool, gt, (0, 0, 0, 0))
            return {'lq': lq_pool, 'gt': gt_pool, 'ptr': state['ptr']}, lq_out, gt_out

        def not_full(_):
            start = state['ptr']
            lq_pool = jax.lax.dynamic_update_slice(state['lq'], lq, (start, 0, 0, 0))
            gt_pool = jax.lax.dynamic_update_slice(state['gt'], gt, (start, 0, 0, 0))
            return {'lq': lq_pool, 'gt': gt_pool, 'ptr': start + b}, lq, gt

        return jax.lax.cond(state['ptr'] >= qs, full, not_full, None)
