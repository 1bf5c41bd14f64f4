"""BaseModel — the training-logic lifecycle, TPU-native.

Re-design of reference basicsr/models/base_model.py:13-401. The contract is
kept — ``feed_data / optimize_parameters / test / validation / save /
resume_training``, EMA, best-metric tracking, checkpoint labels — but the
execution core is functional: parameters, EMA and optimizer state live in an
immutable ``TrainState`` pytree; ``optimize_parameters`` invokes a pure
jitted step compiled once over the device mesh (grad all-reduce is inserted
by XLA from the batch sharding — the DDP analog); checkpoints are Orbax
directories instead of ``.pth`` files.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from copy import deepcopy
from os import path as osp
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..parallel.mesh import create_mesh, replicate, shard_batch
from ..utils.dist_util import get_dist_info, is_master as dist_util_is_master
from ..utils.logger import get_root_logger
from .lr_scheduler import build_schedule


class TrainState(struct.PyTreeNode):
    """Immutable train state: the unit of checkpointing and of the jitted step.

    ``stats`` carries non-param variable collections (e.g. BatchNorm
    batch_stats for discriminators); None for stat-less networks."""
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any
    stats: Any = None


def jit_init(fn: Callable) -> Callable:
    """Compile a flax ``init`` (or any param-construction fn) into ONE
    executable on accelerator backends. Eager init issues one RPC per op —
    over the remote 'axon' TPU tunnel a large net's creation takes MINUTES
    (BasicVSR++ measured ~14 min eager; round 3's driver bench died in
    stage-by-stage network creation). On CPU per-op dispatch is free and
    the jit compile would dominate instead (the test suite creates hundreds
    of models), so eager is kept there."""
    return jax.jit(fn) if jax.default_backend() != 'cpu' else fn


def build_optimizer(optim_opt: dict, schedule: Callable) -> optax.GradientTransformation:
    """Optimizer factory (reference base_model.py:107-125). ``lr`` is driven
    by the injected schedule."""
    opt = dict(optim_opt)
    optim_type = opt.pop('type', 'Adam')
    opt.pop('lr', None)
    betas = opt.pop('betas', (0.9, 0.999))
    weight_decay = opt.pop('weight_decay', 0.0)
    eps = opt.pop('eps', 1e-8)

    if optim_type == 'Adam':
        if weight_decay:
            # torch Adam's weight_decay is L2-IN-GRADIENT (added before the
            # moment estimates), not AdamW's decoupled decay — compose the
            # decay ahead of the Adam transform to match
            tx = optax.chain(optax.add_decayed_weights(weight_decay),
                             optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps))
        else:
            tx = optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps)
    elif optim_type == 'AdamW':
        tx = optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    elif optim_type == 'Adamax':
        tx = optax.adamax(schedule, b1=betas[0], b2=betas[1], eps=eps)
    elif optim_type == 'SGD':
        tx = optax.sgd(schedule, momentum=opt.pop('momentum', 0.0))
    elif optim_type == 'RMSprop':
        tx = optax.rmsprop(schedule, momentum=opt.pop('momentum', 0.0), eps=eps)
    elif optim_type == 'Adafactor':
        tx = optax.adafactor(schedule)
    elif optim_type == 'Lamb':
        tx = optax.lamb(schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    else:
        raise NotImplementedError(f'optimizer {optim_type} is not supported yet.')
    return tx


def ema_update(ema_params, params, decay: float):
    """EMA lerp (reference base_model.py:75-85): ema = ema*decay + p*(1-decay)."""
    return jax.tree_util.tree_map(lambda e, p: e * decay + p * (1. - decay), ema_params, params)


def advance_schedule_count(opt_state):
    """Advance only the LR-schedule counters inside an optax state.

    Used on gated-off update iterations (``net_d_iters``): the reference
    steps LR schedulers every iteration but leaves the optimizer untouched,
    so Adam moments/bias-correction counts must NOT advance while the
    schedule position must."""
    def bump(s):
        if isinstance(s, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(count=s.count + 1)
        return s

    return jax.tree_util.tree_map(
        bump, opt_state, is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState))


class BaseModel:
    """Base model (reference base_model.py:13)."""

    def __init__(self, opt):
        self.opt = opt
        self.is_train = opt['is_train']
        self.schedulers_info = []  # (name, schedule_fn) for logging
        self.optimizers_info = []
        self.mesh = create_mesh(opt)
        self.log_dict: Dict[str, float] = {}
        self.best_metric_results: Dict[str, Any] = {}
        # Model rng is process-IDENTICAL on purpose: param init must agree
        # across processes (the DDP-broadcast analog, reference
        # base_model.py:95-103), and in-graph training randomness feeds ONE
        # global SPMD computation — per-process divergence would silently
        # corrupt the lockstep step. Per-rank DATA randomness comes from the
        # loader seeds (seed + rank, utils/options.py), not from here.
        self.rng = jax.random.PRNGKey(opt.get('manual_seed', 0) or 0)

    def kernel_scope(self):
        """Trace-time dispatch scope for the fused Pallas kernels: open this
        INSIDE every function handed to ``jax.jit`` so the ops shard_map
        their kernels over exactly this model's mesh (ops/dispatch.py)."""
        from ..ops.dispatch import kernel_mesh
        return kernel_mesh(self.mesh)

    # ------------------------------------------------------------------ API
    def feed_data(self, data):
        pass

    def optimize_parameters(self, current_iter):
        pass

    def get_current_visuals(self):
        pass

    def save(self, epoch, current_iter):
        pass

    def validation(self, dataloader, current_iter, tb_logger, save_img: bool = False):
        """Dispatch to dist/nondist validation (reference base_model.py:43-48).
        On TPU, per-process validation striding replaces dist.reduce."""
        if self.opt.get('dist', False) and jax.process_count() > 1:
            self.dist_validation(dataloader, current_iter, tb_logger, save_img)
        else:
            self.nondist_validation(dataloader, current_iter, tb_logger, save_img)

    def dist_validation(self, dataloader, current_iter, tb_logger, save_img):
        self.nondist_validation(dataloader, current_iter, tb_logger, save_img)

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        raise NotImplementedError

    # ------------------------------------------------- best-metric tracking
    def _initialize_best_metric_results(self, dataset_name):
        """(reference base_model.py:50-68)"""
        if dataset_name in self.best_metric_results:
            return
        record = dict()
        for metric, content in self.opt['val']['metrics'].items():
            better = content.get('better', 'higher')
            init_val = float('-inf') if better == 'higher' else float('inf')
            record[metric] = dict(better=better, val=init_val, iter=-1)
        self.best_metric_results[dataset_name] = record

    def _update_best_metric_result(self, dataset_name, metric, val, current_iter):
        record = self.best_metric_results[dataset_name][metric]
        if record['better'] == 'higher':
            if val >= record['val']:
                record['val'] = val
                record['iter'] = current_iter
        else:
            if val <= record['val']:
                record['val'] = val
                record['iter'] = current_iter

    # --------------------------------------------------------------- sched
    def get_current_learning_rate(self):
        """Evaluate schedules host-side at the current step for logging."""
        step = int(self.current_step())
        return [float(sched(step)) for _, sched in self.schedulers_info]

    def update_learning_rate(self, current_iter, warmup_iter: int = -1):
        """No-op: the schedule (incl. warm-up) is compiled into the step.
        Kept for train-pipeline API parity (reference base_model.py:185-206)."""

    def current_step(self) -> int:
        raise NotImplementedError

    # --------------------------------------------------------------- utils
    def get_current_log(self):
        from collections import OrderedDict as _OD
        return _OD((k, float(v) if hasattr(v, 'dtype') else v)
                   for k, v in self.log_dict.items())

    def model_to_device(self, net):
        """No-op on TPU: placement is carried by shardings. Kept for parity
        (reference base_model.py:87-105)."""
        return net

    def print_network(self, net, params=None):
        """Log class name + param count (reference base_model.py:146-162)."""
        logger = get_root_logger()
        name = net.__class__.__name__
        if params is not None:
            n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
            logger.info(f'Network: {name}, with parameters: {n:,d}')
        else:
            logger.info(f'Network: {name}')

    # --------------------------------------------------------- checkpointing
    def _ckpt_dir(self, label: str, current_iter) -> str:
        return osp.join(self.opt['path']['models'], f'net_{label}_{current_iter}')

    @staticmethod
    def _skip_nonmaster_save() -> bool:
        """The reference master-gates ``torch.save`` (base_model.py:212).
        Orbax saves are COLLECTIVE when ``jax.process_count() > 1`` (every
        process must enter so its internal cross-process barriers pair up —
        a rank-0-only call deadlocks; orbax itself writes each array once).
        Only the single-process fake-dist case keeps the rank gate."""
        return jax.process_count() == 1 and not dist_util_is_master()

    def save_network(self, params_dict: Dict[str, Any], label: str, current_iter):
        """Save network params. ``params_dict`` maps param-key -> pytree,
        e.g. {'params': ..., 'params_ema': ...} (reference base_model.py:212-256,
        retry x3)."""
        if self._skip_nonmaster_save():
            return
        if current_iter == -1:
            current_iter = 'latest'
        save_path = self._ckpt_dir(label, current_iter)
        import orbax.checkpoint as ocp
        host_tree = jax.tree_util.tree_map(np.asarray, params_dict)
        retry = 3
        while retry > 0:
            try:
                ckptr = ocp.PyTreeCheckpointer()
                ckptr.save(os.path.abspath(save_path), host_tree, force=True)
                break
            except Exception as e:
                logger = get_root_logger()
                logger.warning(f'Save model error: {e}, remaining retry times: {retry - 1}')
                time.sleep(1)
                retry -= 1
        if retry == 0:
            raise IOError(f'Cannot save {save_path}.')

    def load_network(self, load_path: str, param_key: str = 'params', strict: bool = True,
                     template: Any = None, rules=None):
        """Load a network param pytree. Accepts our Orbax dirs; if given a
        reference ``.pth`` file, converts it (torch NCHW -> NHWC HWIO) via
        ``utils.torch_convert`` (reference base_model.py:293-319)."""
        logger = get_root_logger()
        if load_path.endswith('.pth'):
            from ..utils.torch_convert import load_torch_checkpoint
            tree = load_torch_checkpoint(load_path, param_key=param_key, rules=rules)
        else:
            import orbax.checkpoint as ocp
            ckptr = ocp.PyTreeCheckpointer()
            restored = ckptr.restore(os.path.abspath(load_path))
            if param_key in restored:
                tree = restored[param_key]
            elif param_key == 'params_ema' and 'params' in restored:
                logger.info('Loading: params_ema does not exist, use params.')
                tree = restored['params']
            else:
                tree = restored
        logger.info(f'Loading model from {load_path}, with param key: [{param_key}].')
        if template is not None:
            tree = _match_tree(tree, template, strict=strict)
        return tree

    def save_training_state(self, epoch: int, current_iter: int, state_extra: Dict[str, Any]):
        """Save resume state (reference base_model.py:321-358). Collective
        under multi-process jax — see ``_skip_nonmaster_save``."""
        if current_iter == -1 or self._skip_nonmaster_save():
            return
        import orbax.checkpoint as ocp
        state = {'epoch': epoch, 'iter': current_iter, **state_extra}
        save_path = osp.join(self.opt['path']['training_states'], f'{current_iter}.state')
        host_tree = jax.tree_util.tree_map(np.asarray, state)
        retry = 3
        while retry > 0:
            try:
                ckptr = ocp.PyTreeCheckpointer()
                ckptr.save(os.path.abspath(save_path), host_tree, force=True)
                break
            except Exception as e:
                logger = get_root_logger()
                logger.warning(f'Save training state error: {e}, remaining retry times: {retry - 1}')
                time.sleep(1)
                retry -= 1
        if retry == 0:
            raise IOError(f'Cannot save {save_path}.')

    def load_training_state(self, state_path: str):
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(state_path))

    def resume_training(self, resume_state):
        raise NotImplementedError

    # ------------------------------------------------------------- loss agg
    def reduce_loss_dict(self, loss_dict: Dict[str, jnp.ndarray]) -> OrderedDict:
        """The reference dist-reduces a torch loss dict (base_model.py:376-401).
        Here the jitted step already returns globally-reduced scalars (XLA
        psum over the data axis). Values stay as DEVICE arrays — converting
        per step would force a device->host sync on the critical path and
        break async dispatch; ``get_current_log`` floats them lazily at
        print/validation time."""
        return OrderedDict(loss_dict)


def _match_tree(tree, template, strict: bool = True):
    """Align a restored pytree with a template: report key/shape mismatches
    (reference base_model.py:258-291) and, when ``strict=False``, fall back
    to template values for missing/mismatched leaves."""
    logger = get_root_logger()
    flat_tpl = _flatten_dict(template)
    flat_new = _flatten_dict(tree)
    missing = set(flat_tpl) - set(flat_new)
    unexpected = set(flat_new) - set(flat_tpl)
    mismatched = {k for k in (set(flat_tpl) & set(flat_new))
                  if tuple(np.shape(flat_tpl[k])) != tuple(np.shape(flat_new[k]))}
    for k in sorted(missing):
        logger.warning(f'Loading: missing key {k}')
    for k in sorted(unexpected):
        logger.warning(f'Loading: unexpected key {k}')
    for k in sorted(mismatched):
        logger.warning(f'Size mismatch for {k}: template {np.shape(flat_tpl[k])} vs '
                       f'loaded {np.shape(flat_new[k])}')
    if strict and (missing or mismatched or unexpected):
        # torch strict load_state_dict also rejects unexpected keys — a
        # typo'd or wrong checkpoint must not load partially and silently.
        raise KeyError(f'Checkpoint does not match network: missing={sorted(missing)}, '
                       f'unexpected={sorted(unexpected)}, mismatched={sorted(mismatched)}')
    out = {}
    for k, v in flat_tpl.items():
        if k in flat_new and k not in mismatched:
            out[k] = np.asarray(flat_new[k], dtype=np.asarray(v).dtype) if hasattr(v, 'dtype') else flat_new[k]
        else:
            out[k] = v
    return _unflatten_dict(out)


def _flatten_dict(d, prefix=()):
    flat = {}
    if isinstance(d, (dict, FrozenDict)):
        for k, v in d.items():
            flat.update(_flatten_dict(v, prefix + (k,)))
    else:
        flat['.'.join(prefix)] = d
    return flat


def _unflatten_dict(flat):
    out: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split('.')
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out
