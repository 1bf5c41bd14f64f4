"""RS align-loss parity vs the reference (align_loss.py:9-300): Lanczos
sub-pixel shift bank, per-shift losses, batchwise min-over-shifts."""

import sys
from os import path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from ref_loader import load_ref_module  # noqa: E402


@pytest.mark.parametrize('loss_func,step', [('l1', 1.0), ('l2', 1.0), ('l1', 0.5)])
def test_registered_loss_parity(loss_func, step):
    import torch
    am = load_ref_module('basicsr/losses/align_loss.py')
    from basicsr4rs_tpu.losses.align_loss import RegisteredLoss
    kw = dict(start=-1.0, end=1.0, step=step, loss_func=loss_func,
              loss_weight=0.8, reduction='mean')
    rng = np.random.RandomState(0)
    pred = rng.rand(2, 3, 24, 24).astype(np.float32)
    gt = rng.rand(2, 3, 24, 24).astype(np.float32)
    with torch.no_grad():
        want = float(am.RegisteredLoss(**kw)(torch.from_numpy(pred),
                                             torch.from_numpy(gt)))
    got = float(RegisteredLoss(**kw)(jnp.asarray(pred.transpose(0, 2, 3, 1)),
                                     jnp.asarray(gt.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize('strategy', ['gt', 'lq'])
def test_encoder_loss_parity(strategy):
    import torch
    am = load_ref_module('basicsr/losses/align_loss.py')
    from basicsr4rs_tpu.losses.align_loss import EncoderLoss
    rng = np.random.RandomState(1)
    enc = rng.rand(2, 8, 16, 16).astype(np.float32)
    gt = rng.rand(2, 8, 16, 16).astype(np.float32)
    lq = rng.rand(2, 8, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = float(am.EncoderLoss(strategy=strategy)(
            torch.from_numpy(enc), torch.from_numpy(gt), torch.from_numpy(lq)))
    got = float(EncoderLoss(strategy=strategy)(
        jnp.asarray(enc.transpose(0, 2, 3, 1)), jnp.asarray(gt.transpose(0, 2, 3, 1)),
        jnp.asarray(lq.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
