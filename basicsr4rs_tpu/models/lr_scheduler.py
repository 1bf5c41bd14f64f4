"""Learning-rate schedules (reference: basicsr/models/lr_scheduler.py:6-96).

Implemented as pure ``step -> lr`` functions (jnp-friendly) so they compile
into the train step via ``optax.inject_hyperparams``; the same callables are
evaluated host-side for log messages. Linear warm-up (reference
base_model.py:185-206) is composed as a wrapper.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np


def get_position_from_periods(iteration: int, cumulative_period: Sequence[int]) -> int:
    """Index of the period containing ``iteration`` (reference lr_scheduler.py:36-54)."""
    for i, period in enumerate(cumulative_period):
        if iteration <= period:
            return i
    raise ValueError(f'iteration {iteration} exceeds cumulative periods {cumulative_period}')


def multi_step_restart_lr(base_lr: float,
                          milestones: Sequence[int],
                          gamma: float = 0.1,
                          restarts: Sequence[int] = (0,),
                          restart_weights: Sequence[float] = (1,)) -> Callable:
    """MultiStepRestartLR (reference lr_scheduler.py:6-33): decay by gamma at
    each milestone; at a restart iteration, reset to base_lr * weight."""
    assert len(restarts) == len(restart_weights), 'restarts and their weights do not match.'
    milestones_arr = jnp.asarray(sorted(milestones), dtype=jnp.float32)
    restarts_arr = jnp.asarray(list(restarts), dtype=jnp.float32)
    weights_arr = jnp.asarray(list(restart_weights), dtype=jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        # last restart <= step
        ri = jnp.maximum(jnp.sum(step >= restarts_arr) - 1, 0)
        restart_iter = restarts_arr[ri]
        weight = weights_arr[ri]
        # milestones passed since the restart (inclusive, matching
        # bisect_right semantics of the reference)
        n_decays = jnp.sum(step >= milestones_arr) - jnp.sum(restart_iter >= milestones_arr)
        return base_lr * weight * jnp.power(gamma, n_decays.astype(jnp.float32))

    return schedule


def cosine_annealing_restart_lr(base_lr: float,
                                periods: Sequence[int],
                                restart_weights: Sequence[float] = (1,),
                                eta_min: float = 0) -> Callable:
    """CosineAnnealingRestartLR (reference lr_scheduler.py:57-96).

    lr(t) = eta_min + 0.5 * (base_lr * w_i - eta_min) *
            (1 + cos(pi * (t - start_i) / period_i))
    """
    assert len(periods) == len(restart_weights), 'periods and restart_weights should have the same length.'
    cumulative = np.cumsum(np.asarray(periods)).tolist()
    starts = [0] + cumulative[:-1]

    def schedule(step):
        # jnp-friendly piecewise evaluation.
        step = jnp.asarray(step, dtype=jnp.float32)
        lrs = []
        for i, period in enumerate(periods):
            start = starts[i]
            w = restart_weights[i]
            t = jnp.clip(step - start, 0, period)
            lrs.append(eta_min + 0.5 * (base_lr * w - eta_min) * (1 + jnp.cos(jnp.pi * t / period)))
        # select the active period; the reference's get_position_from_periods
        # is INCLUSIVE (iteration <= cumulative, lr_scheduler.py:36-54): the
        # boundary step itself still evaluates the ending period at t=period
        # (= eta_min), and the restart top appears one step later
        boundaries = jnp.asarray(cumulative, dtype=jnp.float32)
        idx = jnp.sum(step > boundaries)  # 0..len-1 (clamp into range)
        idx = jnp.minimum(idx, len(periods) - 1)
        return jnp.stack(lrs)[idx]

    return schedule


def constant_lr(base_lr: float) -> Callable:
    return lambda step: jnp.asarray(base_lr, dtype=jnp.float32)


def with_linear_warmup(schedule: Callable, warmup_iter: int = -1) -> Callable:
    """Linear warm-up (reference base_model.py:185-206): while
    ``current_iter < warmup_iter`` the lr is ``init_lr * current_iter /
    warmup_iter`` — the INITIAL lr scaled (not the scheduled one), and
    nonzero from the first iteration. ``step`` here is pre-increment
    (current_iter - 1)."""
    if warmup_iter <= 0:
        return schedule

    init_lr = float(schedule(0))

    def warmed(step):
        cur = jnp.asarray(step, dtype=jnp.float32) + 1.
        return jnp.where(cur < warmup_iter, init_lr * cur / warmup_iter,
                         schedule(step))

    return warmed


def build_schedule(base_lr: float, scheduler_opt: dict, warmup_iter: int = -1) -> Callable:
    """Build a schedule from the YAML ``train.scheduler`` block."""
    opt = dict(scheduler_opt or {})
    sched_type = opt.pop('type', 'ConstantLR')
    if sched_type in ('MultiStepLR', 'MultiStepRestartLR'):
        fn = multi_step_restart_lr(base_lr, **opt)
    elif sched_type == 'CosineAnnealingRestartLR':
        fn = cosine_annealing_restart_lr(base_lr, **opt)
    elif sched_type in ('ConstantLR', 'none', None):
        fn = constant_lr(base_lr)
    else:
        raise NotImplementedError(f'Scheduler {sched_type} is not implemented yet.')
    return with_linear_warmup(fn, warmup_iter)
