"""LR-schedule parity vs the reference torch schedulers
(basicsr/models/lr_scheduler.py:6-96 + the warm-up in base_model.py:185-206).

The reference calls ``scheduler.step()`` at every ``current_iter > 1``, so
the lr used at iteration k is torch's lr at ``last_epoch = k - 1`` — which
is exactly our ``schedule(step)`` with the pre-increment step.
"""

import importlib.util

import numpy as np

from basicsr4rs_tpu.models.lr_scheduler import build_schedule

LR = 2e-4


def _load_ref_lr_scheduler():
    # standalone file load: basicsr.models.__init__ has unmet deps, and
    # lr_scheduler.py itself only needs torch
    spec = importlib.util.spec_from_file_location(
        'ref_lr_scheduler', '/root/reference/basicsr/models/lr_scheduler.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _torch_lrs(scheduler_ctor, n, warmup_iter=-1, **kwargs):
    import warnings

    import torch
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=LR)
    sched = scheduler_ctor(opt, **kwargs)
    lrs = []
    with warnings.catch_warnings():
        # no optimizer.step() here on purpose: we replay the reference's
        # update_learning_rate() call pattern, torch's ordering warning is
        # expected noise
        warnings.simplefilter('ignore', UserWarning)
        for current_iter in range(1, n + 1):
            # reference update_learning_rate (base_model.py:185-206)
            if current_iter > 1:
                sched.step()
            lr = opt.param_groups[0]['lr']
            if current_iter < warmup_iter:
                lr = LR / warmup_iter * current_iter
            lrs.append(lr)
    return np.asarray(lrs)


def _our_lrs(scheduler_opt, n, warmup_iter=-1):
    schedule = build_schedule(LR, scheduler_opt, warmup_iter)
    return np.asarray([float(schedule(k - 1)) for k in range(1, n + 1)])


def test_cosine_annealing_restart_parity():
    ref = _load_ref_lr_scheduler()
    kwargs = dict(periods=[50, 50, 100], restart_weights=[1, 0.5, 0.5],
                  eta_min=1e-7)
    want = _torch_lrs(ref.CosineAnnealingRestartLR, 200, **kwargs)
    got = _our_lrs({'type': 'CosineAnnealingRestartLR', **kwargs}, 200)
    # rtol 1e-3: our schedule evaluates in f32 (compiled into the step),
    # torch in f64 — restart/boundary placement is what this test pins
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-9)


def test_multi_step_restart_parity():
    ref = _load_ref_lr_scheduler()
    kwargs = dict(milestones=[30, 60, 150], gamma=0.5,
                  restarts=[100], restart_weights=[0.7])
    want = _torch_lrs(ref.MultiStepRestartLR, 200, **kwargs)
    got = _our_lrs({'type': 'MultiStepRestartLR', 'milestones': [30, 60, 150],
                    'gamma': 0.5, 'restarts': [0, 100],
                    'restart_weights': [1, 0.7]}, 200)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-10)


def test_warmup_parity():
    """Warm-up must be init_lr * current_iter / warmup_iter — nonzero on the
    FIRST iteration — then hand over to the schedule."""
    ref = _load_ref_lr_scheduler()
    kwargs = dict(periods=[100], restart_weights=[1], eta_min=1e-7)
    want = _torch_lrs(ref.CosineAnnealingRestartLR, 100, warmup_iter=20, **kwargs)
    got = _our_lrs({'type': 'CosineAnnealingRestartLR', **kwargs}, 100,
                   warmup_iter=20)
    assert got[0] > 0, 'first-iteration lr must not be zero under warm-up'
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-10)
