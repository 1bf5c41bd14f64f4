"""Optimizer-semantics parity vs torch (reference base_model.py:107-125).

torch Adam's ``weight_decay`` is L2-in-gradient (decay enters the moment
estimates), NOT AdamW's decoupled decay — build_optimizer must reproduce
that for configs that set it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from basicsr4rs_tpu.models.base_model import build_optimizer


def _run_ours(optim_opt, steps, x0, grad_fn, lr):
    tx = build_optimizer(optim_opt, lambda step: lr)
    x = jnp.asarray(x0)
    state = tx.init(x)
    import optax
    for _ in range(steps):
        g = jnp.asarray(grad_fn(np.asarray(x)))
        updates, state = tx.update(g, state, x)
        x = optax.apply_updates(x, updates)
    return np.asarray(x)


def _run_torch(ctor_kwargs, steps, x0, grad_fn, lr):
    import torch
    x = torch.nn.Parameter(torch.from_numpy(np.asarray(x0).copy()))
    opt = torch.optim.Adam([x], lr=lr, **ctor_kwargs)
    for _ in range(steps):
        opt.zero_grad()
        x.grad = torch.from_numpy(np.asarray(grad_fn(x.detach().numpy())))
        opt.step()
    return x.detach().numpy()


def test_adam_weight_decay_is_l2_in_gradient():
    x0 = np.linspace(-1., 1., 8).astype(np.float32)
    grad_fn = lambda x: (2.0 * x + 0.3).astype(np.float32)  # noqa: E731
    lr = 1e-2
    want = _run_torch({'weight_decay': 0.05}, 25, x0, grad_fn, lr)
    got = _run_ours({'type': 'Adam', 'lr': lr, 'weight_decay': 0.05}, 25,
                    x0, grad_fn, lr)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # and it must NOT match decoupled AdamW
    got_adamw = _run_ours({'type': 'AdamW', 'lr': lr, 'weight_decay': 0.05},
                          25, x0, grad_fn, lr)
    assert np.abs(got_adamw - want).max() > 1e-5


def test_adam_no_decay_matches_torch():
    x0 = np.linspace(-1., 1., 8).astype(np.float32)
    grad_fn = lambda x: (2.0 * x + 0.3).astype(np.float32)  # noqa: E731
    lr = 1e-2
    want = _run_torch({}, 25, x0, grad_fn, lr)
    got = _run_ours({'type': 'Adam', 'lr': lr}, 25, x0, grad_fn, lr)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
