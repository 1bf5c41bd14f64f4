"""Registration-invariant losses for misaligned RS pairs
(reference: basicsr/losses/align_loss.py:9-300).

``RegisteredLoss`` evaluates the pixel loss over a precomputed bank of
Lanczos sub-pixel shifts of the prediction and forwards the per-sample
minimum — making training invariant to small LQ/GT misregistration. The
shift bank is static (numpy at construction), so the whole thing jits into
S^2 depthwise convs + a min-reduce.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import LOSS_REGISTRY


def lanczos_kernel(dx: np.ndarray, a: int = 3) -> np.ndarray:
    """1D Lanczos translation kernels (reference align_loss.py:9-60).

    Args:
        dx: (S, 1) shifts in pixels.
    Returns:
        (S, K) kernels.
    """
    dx = np.atleast_2d(np.asarray(dx, np.float64))
    D = np.ceil(np.abs(dx)).astype(int)
    S = 2 * (a + D) + 1
    N = S.max()
    Z = (N - S) // 2
    start = (-(a + D + Z)).min()
    end = (a + D + Z + 1).max()
    x = np.arange(start, end, dtype=np.float64)[None, :] - dx
    px = np.pi * x + 1e-3
    k = a * np.sin(px) * np.sin(px / a) / px**2
    return k.astype(np.float32)


class ShiftBank:
    """Precomputed separable Lanczos shift kernels
    (reference ShiftConv2d, align_loss.py:63-158)."""

    def __init__(self, start: float, end: float, step: float):
        shifts = np.arange(start, end + 1e-3, step)[:, None]
        self.kernels = lanczos_kernel(shifts, a=3)  # (S, K)
        self.num_shifts = self.kernels.shape[0]
        self.ksize = self.kernels.shape[1]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x (N, H, W, C) -> (N, S*S, H, W, C), all (dy, dx) shift combos."""
        n, h, w, c = x.shape
        kys = jnp.asarray(self.kernels)  # (S, K)
        outs_y = []
        for s in range(self.num_shifts):
            ky = kys[s].reshape(-1, 1, 1, 1)
            ky = jnp.tile(ky, (1, 1, 1, c))
            outs_y.append(jax.lax.conv_general_dilated(
                x, ky, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                feature_group_count=c))
        ys = jnp.stack(outs_y, axis=1).reshape(n * self.num_shifts, h, w, c)
        outs = []
        for t in range(self.num_shifts):
            kx = kys[t].reshape(1, -1, 1, 1)
            kx = jnp.tile(kx, (1, 1, 1, c))
            outs.append(jax.lax.conv_general_dilated(
                ys, kx, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                feature_group_count=c))
        out = jnp.stack(outs, axis=1)  # (n*S, S, h, w, c)
        return out.reshape(n, self.num_shifts * self.num_shifts, h, w, c)


@LOSS_REGISTRY.register()
class RegisteredLoss:
    """min-over-shifts pixel loss (reference align_loss.py:162-257)."""

    def __init__(self, start: float, end: float, step: float, loss_func: str = 'l1',
                 loss_weight: float = 1.0, reduction: str = 'mean'):
        self.bank = ShiftBank(start, end, step)
        if loss_func.lower() == 'l1':
            self.elem = lambda a, b: jnp.abs(a - b)
        elif loss_func.lower() in ('mse', 'l2'):
            self.elem = lambda a, b: (a - b)**2
        else:
            raise ValueError(f"Unsupported loss_func: {loss_func}. Choose from ['l1', 'mse']")
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.border = self.bank.ksize // 2

    def __call__(self, y_pred: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        w = self.border
        shifted = self.bank(y_pred)[:, :, w:-w, w:-w, :]   # (N, S^2, H', W', C)
        target = y[:, None, w:-w, w:-w, :]
        loss = jnp.mean(self.elem(shifted, target), axis=(2, 3, 4))  # (N, S^2)
        min_loss = jnp.min(loss, axis=1)
        if self.reduction == 'mean':
            out = jnp.mean(min_loss)
        elif self.reduction == 'sum':
            out = jnp.sum(min_loss)
        elif self.reduction == 'none':
            out = min_loss
        else:
            raise NotImplementedError(f'Unsupported reduction {self.reduction}')
        return self.loss_weight * out


@LOSS_REGISTRY.register()
class EncoderLoss:
    """Encoder output vs GT or vs bilinear-upsampled LQ
    (reference align_loss.py:260-300)."""

    def __init__(self, loss_weight: float = 1.0, strategy: str = 'gt', reduction: str = 'mean'):
        if strategy not in ('gt', 'lq'):
            raise ValueError(f'Unsupported loss strategy {strategy}')
        if reduction not in ('none', 'mean', 'sum'):
            raise ValueError(f'Unsupported reduction mode: {reduction}')
        self.loss_weight = loss_weight
        self.strategy = strategy
        self.reduction = reduction

    def _reduce(self, loss):
        if self.reduction == 'mean':
            return jnp.mean(loss)
        if self.reduction == 'sum':
            return jnp.sum(loss)
        return loss

    def __call__(self, z_start, gt, lq=None):
        if self.strategy == 'gt':
            loss = (z_start - gt)**2
        else:
            if lq is None:
                raise ValueError("EncoderLoss(strategy='lq') requires the lq argument")
            from ..archs.arch_util import resize_bilinear
            lq_up = resize_bilinear(lq, z_start.shape[1], z_start.shape[2])
            loss = (z_start - lq_up)**2
        return self.loss_weight * self._reduce(loss)
