"""Loss helpers: weighted-reduction decorator and the LDL artifact map
(reference: basicsr/losses/loss_util.py:26-145)."""

from __future__ import annotations

import functools

import jax.numpy as jnp


def reduce_loss(loss, reduction: str):
    """none / mean / sum (reference loss_util.py:26-44)."""
    if reduction == 'none':
        return loss
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    raise ValueError(f'reduction "{reduction}" is not supported. Supported: none, mean, sum.')


def weight_reduce_loss(loss, weight=None, reduction: str = 'mean'):
    """Apply elementwise weight then reduce (reference loss_util.py:47-76).

    With a weight and 'mean' reduction the reference averages over
    weighted-channel count: sum(loss*w) / (sum over elements where the
    weight is broadcast to full shape) — we reproduce that by normalizing
    by weight-broadcast size when all weights are 1, else by sum of weights
    over the broadcast shape.
    """
    if weight is not None:
        loss = loss * weight
    if weight is None or reduction == 'sum' or reduction == 'none':
        return reduce_loss(loss, reduction)
    # weighted mean: the reference divides by (weight.sum() * broadcast ratio)
    # when weight has fewer channels; equivalent general form:
    ratio = loss.size / jnp.broadcast_to(weight, loss.shape).size
    denom = jnp.sum(jnp.broadcast_to(weight, loss.shape)) + 1e-12
    return jnp.sum(loss) / denom


def weighted_loss(loss_func):
    """Decorator adding (weight, reduction) to an elementwise loss
    (reference loss_util.py:58-118)."""

    @functools.wraps(loss_func)
    def wrapper(pred, target, weight=None, reduction='mean', **kwargs):
        loss = loss_func(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction)

    return wrapper


def get_refined_artifact_map(img_gt, img_output, img_ema, ksize: int = 7):
    """LDL locally-discriminative artifact map (reference loss_util.py:99-145):
    per-pixel UNBIASED variance of the |residual| in a reflect-padded ksize
    window, scaled by (unbiased whole-image residual variance)^(1/5);
    zeroed where the live output already beats the EMA output. NHWC."""
    import jax

    pad = (ksize - 1) // 2
    n = ksize * ksize

    def local_var(residual):
        # reference get_local_weights (:99-118): reflect pad + unfold +
        # torch.var(unbiased=True) over each window
        rp = jnp.pad(residual, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode='reflect')
        k = jnp.ones((ksize, ksize, 1, 1), residual.dtype)

        def conv(v):
            return jax.lax.conv_general_dilated(v, k, (1, 1), 'VALID',
                                                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        s1 = conv(rp)
        s2 = conv(rp ** 2)
        return (s2 - s1 ** 2 / n) / (n - 1)

    residual_ema = jnp.sum(jnp.abs(img_gt - img_ema), axis=3, keepdims=True)
    residual_sr = jnp.sum(jnp.abs(img_gt - img_output), axis=3, keepdims=True)
    # torch.var over (C,H,W) per sample, unbiased (reference :140)
    mu = jnp.mean(residual_sr, axis=(1, 2, 3), keepdims=True)
    cnt = residual_sr.shape[1] * residual_sr.shape[2] * residual_sr.shape[3]
    patch_var = jnp.sum((residual_sr - mu) ** 2, axis=(1, 2, 3),
                        keepdims=True) / (cnt - 1)
    patch_level_weight = patch_var ** (1 / 5)
    pixel_level_weight = local_var(residual_sr)
    overall_weight = patch_level_weight * pixel_level_weight
    return jnp.where(residual_sr < residual_ema, 0.0, overall_weight)
