"""SRModel — single-image SR training/eval logic
(reference: basicsr/models/sr_model.py:17-279).

The torch version mutates module state per call; here the whole optimization
step is one pure function compiled over the mesh:

    train_step(state, batch, rng) -> (state, logs)

Batch arrives sharded over the ``data`` axis, parameters replicated; XLA
inserts the gradient all-reduce (DDP analog). EMA is folded into the same
step. Evaluation pads inputs to a shape bucket to bound recompilation.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from os import path as osp
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..archs import build_network
from ..losses import build_loss
from ..metrics import calculate_metric
from ..utils.img_util import imwrite, tensor2img
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from ..parallel.mesh import replicate, shard_batch
from .base_model import BaseModel, jit_init, TrainState, build_optimizer, ema_update
from .lr_scheduler import build_schedule


def flips_inverse(ys):
    """Undo the [identity, hflip, vflip, hvflip] transform batch (flips are
    involutions)."""
    a, b, c, d = ys
    return [a, b[:, :, ::-1, :], c[:, ::-1, :, :], d[:, ::-1, ::-1, :]]


@MODEL_REGISTRY.register()
class SRModel(BaseModel):

    def __init__(self, opt):
        super().__init__(opt)
        self.net_g = build_network(opt['network_g'])
        self.rng, init_rng = jax.random.split(self.rng)
        import inspect
        try:
            self._net_accepts_train = 'train' in inspect.signature(
                type(self.net_g).__call__).parameters
        except (TypeError, ValueError):
            self._net_accepts_train = False
        variables = jit_init(self._init_variables)(init_rng)
        self.params = variables['params']
        # non-param collections (BatchNorm running stats in DUF/TOF etc.)
        self.net_stats = dict(variables.get('batch_stats', {}))
        self.print_network(self.net_g, self.params)

        # Load pretrained weights (reference sr_model.py:31-35).
        load_path = self.opt['path'].get('pretrain_network_g')
        if load_path is not None:
            param_key = self.opt['path'].get('param_key_g', 'params')
            rules = (getattr(self.net_g, 'torch_key_rules', None)
                     or getattr(type(self.net_g), 'TORCH_KEY_RULES', None))
            self.params = self.load_network(load_path, param_key,
                                            self.opt['path'].get('strict_load_g', True),
                                            template=self.params, rules=rules)

        self.state: Optional[TrainState] = None
        self._eval_fns: Dict[Any, Any] = {}
        if self.is_train:
            self.init_training_settings()
        else:
            self.ema_decay = 0.0
            self.state = TrainState(step=jnp.zeros((), jnp.int32), params=self.params,
                                    ema_params=None, opt_state=(), stats=self.net_stats)

    def _dummy_input(self):
        """Shape used to initialize net_g parameters (conv nets are shape-
        polymorphic; video models override with a 5D clip)."""
        num_in_ch = self.opt['network_g'].get('num_in_ch', 3)
        return jnp.zeros((1, 32, 32, num_in_ch), jnp.float32)

    def _init_variables(self, init_rng):
        """Hook for models whose networks take extra call args (diffusion
        UNets take (x, t, lq))."""
        return self.net_g.init(init_rng, self._dummy_input())

    # ----------------------------------------------------------- training
    def init_training_settings(self):
        train_opt = self.opt['train']
        self.ema_decay = train_opt.get('ema_decay', 0)
        # debug flag: surface mean |offset| of every DCN site in log_dict
        self._log_dcn_offset = bool(train_opt.get('log_dcn_offset', False))
        logger = get_root_logger()
        if self.ema_decay > 0:
            logger.info(f'Use Exponential Moving Average with decay: {self.ema_decay}')

        # Losses (reference sr_model.py:49-64).
        self.cri_pix = build_loss(train_opt['pixel_opt']) if train_opt.get('pixel_opt') else None
        self.cri_perceptual = (build_loss(train_opt['perceptual_opt'])
                               if train_opt.get('perceptual_opt') else None)
        if self.cri_pix is None and self.cri_perceptual is None:
            raise ValueError('Both pixel and perceptual losses are None.')

        self.setup_optimizers()
        self._build_train_step()

    def setup_optimizers(self):
        train_opt = self.opt['train']
        optim_opt = dict(train_opt['optim_g'])
        base_lr = optim_opt.get('lr', 2e-4)
        schedule = build_schedule(base_lr, train_opt.get('scheduler'),
                                  train_opt.get('warmup_iter', -1))
        self.tx = build_optimizer(optim_opt, schedule)
        self.schedulers_info = [('g', schedule)]

        # EMA starts as a *copy* — distinct buffers matter because the train
        # step donates the whole state (same-buffer double donation is an error).
        ema_params = (jax.tree_util.tree_map(jnp.array, self.params)
                      if self.ema_decay > 0 else None)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=self.params,
                           ema_params=ema_params, opt_state=self.tx.init(self.params),
                           stats=self.net_stats)
        self.state = replicate(state, self.mesh)

    def _apply_net_g(self, params, x, stats=None, train=False):
        """Forward through net_g, threading batch_stats when present.
        Returns (output, new_stats, diagnostics). ``diagnostics`` is the
        sown 'diagnostics' collection (DCN offset magnitudes — the in-graph
        replacement for the reference's offset-overflow warning,
        arch_util.py:253-256) when ``train.log_dcn_offset`` is set, else None."""
        variables = {'params': params}
        kwargs = {'train': train} if (self._net_accepts_train and train is not None) else {}
        mutable = []
        if stats:
            variables['batch_stats'] = stats
            if train:
                mutable.append('batch_stats')
        if train and getattr(self, '_log_dcn_offset', False):
            mutable.append('diagnostics')
        if mutable:
            out, updates = self.net_g.apply(variables, x, mutable=mutable, **kwargs)
            return out, updates.get('batch_stats', stats), updates.get('diagnostics')
        return self.net_g.apply(variables, x, **kwargs), stats, None

    def _loss_terms(self, params, batch, stats=None):
        """Forward + losses; shared by subclasses overriding the step.
        Returns (total, (losses, output, new_stats))."""
        output, new_stats, diag = self._apply_net_g(params, batch['lq'], stats, train=True)
        losses = OrderedDict()
        total = 0.0
        if self.cri_pix is not None:
            l_pix = self.cri_pix(output, batch['gt'])
            losses['l_pix'] = l_pix
            total = total + l_pix
        if self.cri_perceptual is not None:
            l_percep, l_style = self.cri_perceptual(output, batch['gt'])
            if l_percep is not None:
                losses['l_percep'] = l_percep
                total = total + l_percep
            if l_style is not None:
                losses['l_style'] = l_style
                total = total + l_style
        if diag:
            # max over all DCN sites — the statistic the reference's >50
            # offset-overflow warning keys on (arch_util.py:253-256)
            losses['dcn_offset_abs_mean'] = jnp.max(
                jnp.stack(jax.tree_util.tree_leaves(diag)))
        return total, (losses, output, new_stats)

    def _postprocess_updates(self, updates, params, step):
        """Hook for per-parameter-group lr multipliers / freezes (video models
        override; reference base_model.py:107-125 param groups)."""
        return updates

    def _build_train_step(self):
        ema_decay = self.ema_decay

        def train_step(state: TrainState, batch):
            with self.kernel_scope():
                (_, (losses, _, new_stats)), grads = jax.value_and_grad(
                    self._loss_terms, has_aux=True)(state.params, batch, state.stats)
                updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
                updates = self._postprocess_updates(updates, state.params, state.step)
                params = optax.apply_updates(state.params, updates)
                ema_params = state.ema_params
                if ema_params is not None:
                    ema_params = ema_update(ema_params, params, ema_decay)
                new_state = state.replace(step=state.step + 1, params=params,
                                          ema_params=ema_params, opt_state=opt_state,
                                          stats=new_stats)
                return new_state, losses

        # the pure step is kept for benchmarks that lax.scan-chain K steps
        # inside ONE executable (per-dispatch host cost over a remote
        # accelerator otherwise inflates step time; scripts/bench_video.py
        # --chain / bench.py train stages)
        self._train_step_fn = train_step
        self._train_step = jax.jit(train_step, donate_argnums=(0,))

    def feed_data(self, data):
        """Host batch -> device, sharded over the data axis
        (reference sr_model.py:86-89). Already-transferred jax arrays (from
        the device prefetcher) pass through untouched."""
        arrays = {k: v for k, v in data.items()
                  if isinstance(v, (np.ndarray, jax.Array))}
        spatial = (self.opt.get('parallel') or {}).get('spatial', 1) > 1
        self.batch = shard_batch(arrays, self.mesh, spatial_sharded=spatial)
        self.batch_meta = {k: v for k, v in data.items() if k not in arrays}

    def optimize_parameters(self, current_iter):
        self.state, losses = self._train_step(self.state, self.batch)
        self.log_dict = self.reduce_loss_dict(losses)

    def current_step(self) -> int:
        return int(self.state.step)

    # --------------------------------------------------------------- eval
    def _localize_for_eval(self, params):
        """Process-local copies of the (globally replicated) params + stats
        for multi-process rank-strided validation: a jit over the global
        mesh would require every process to run the SAME computation in
        lockstep, but validation work is rank-disjoint by design (reference:
        each rank evaluates on its own GPU, video_base_model.py:46-111).
        Fully-replicated global arrays are host-readable, so localization
        is one np.asarray per leaf, cached per training step."""
        step = int(self.state.step)
        cache = getattr(self, '_local_eval_cache', None)
        if cache is None or cache[0] != step or cache[1] is not params:
            local_p = jax.tree_util.tree_map(lambda v: jnp.asarray(np.asarray(v)), params)
            local_s = jax.tree_util.tree_map(lambda v: jnp.asarray(np.asarray(v)),
                                             self.state.stats)
            self._local_eval_cache = (step, params, local_p, local_s)
            cache = self._local_eval_cache
        return cache[2], cache[3]

    def _eval_apply(self, params, lq):
        """Jitted forward, cached per input shape."""
        stats = self.state.stats
        local = jax.process_count() > 1
        if local:
            params, stats = self._localize_for_eval(params)
        key = (lq.shape, lq.dtype.name if hasattr(lq.dtype, 'name') else str(lq.dtype))
        if key not in self._eval_fns:
            # opt-in W8A8 serving mode (ops/quant.py): rewrite eligible
            # convs to int8 MXU convs at trace time. val: quant_int8: true
            # -> dynamic activation scales (calibration-free);
            # 'static' -> calibrate absmax on the first eval batch, then
            # fully static scales (the fast path: int8 intermediates).
            quant = (self.opt.get('val') or {}).get('quant_int8')
            scales = None
            if quant == 'static':
                if getattr(self, '_quant_scales', None) is None:
                    from ..ops.quant import calibrate_act_scales
                    self._quant_scales = calibrate_act_scales(
                        lambda b: self._apply_net_g(params, b, stats,
                                                    train=False)[0], [lq])
                scales = self._quant_scales

            def eval_fn(p, s, x):
                # process-local eval must not scope the GLOBAL mesh (its
                # shard_map would span non-addressable devices)
                import contextlib
                scope = contextlib.nullcontext() if local else self.kernel_scope()
                if quant:
                    from ..ops.quant import quantized_inference
                    qscope = quantized_inference(act_scales=scales)
                else:
                    qscope = contextlib.nullcontext()
                with scope, qscope:
                    return self._apply_net_g(p, x, s, train=False)[0]
            self._eval_fns[key] = jax.jit(eval_fn)
        return self._eval_fns[key](params, stats, lq)

    def _test_params(self):
        if self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    def test(self):
        """No-grad forward with EMA params when available
        (reference sr_model.py:108-129)."""
        self.output = self._eval_apply(self._test_params(), self.batch['lq'])

    def test_selfensemble(self):
        """x8 flip/transpose TTA (reference sr_model.py:131-177). NHWC.

        The reference runs 8 forwards; the 4 flip variants share a shape and
        so do the 4 transposed ones — two batched forwards (4x batch each)
        instead of 8 dispatches, per-sample numerics identical. The batched
        form peaks at 4x eval activation memory; huge tiles can set
        ``val.selfensemble_batched: false`` to recover the reference's
        one-transform-at-a-time loop."""
        lq = self.batch['lq']
        params = self._test_params()

        def flips(x):
            return [x, x[:, :, ::-1, :], x[:, ::-1, :, :], x[:, ::-1, ::-1, :]]

        batched = (self.opt.get('val') or {}).get('selfensemble_batched', True)
        t = jnp.transpose(lq, (0, 2, 1, 3))  # transpose H<->W
        if batched:
            y = jnp.split(self._eval_apply(params, jnp.concatenate(flips(lq), axis=0)), 4, axis=0)
            yt = jnp.split(self._eval_apply(params, jnp.concatenate(flips(t), axis=0)), 4, axis=0)
        else:
            y = [self._eval_apply(params, v) for v in flips(lq)]
            yt = [self._eval_apply(params, v) for v in flips(t)]
        outs = flips_inverse(y)
        outs += [jnp.transpose(inv, (0, 2, 1, 3)) for inv in flips_inverse(yt)]
        self.output = jnp.mean(jnp.stack(outs), axis=0)

    def get_current_visuals(self):
        """(reference sr_model.py:265-272)"""
        out_dict = OrderedDict()
        out_dict['lq'] = np.asarray(self.batch['lq'])
        out_dict['result'] = np.asarray(self.output)
        if 'gt' in self.batch:
            out_dict['gt'] = np.asarray(self.batch['gt'])
        return out_dict

    def dist_validation(self, dataloader, current_iter, tb_logger, save_img):
        """rank0-only validation (reference sr_model.py:179-181)."""
        if self.opt['rank'] == 0:
            self.nondist_validation(dataloader, current_iter, tb_logger, save_img)

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        """(reference sr_model.py:183-248)"""
        dataset_name = dataloader.dataset.opt['name']
        with_metrics = self.opt['val'].get('metrics') is not None
        use_pbar = self.opt['val'].get('pbar', False)

        if with_metrics:
            if not hasattr(self, 'metric_results'):
                self.metric_results = {metric: 0 for metric in self.opt['val']['metrics'].keys()}
            self._initialize_best_metric_results(dataset_name)
            self.metric_results = {metric: 0 for metric in self.metric_results}

        metric_data = dict()
        cnt = 0
        for val_data in dataloader:
            img_name = osp.splitext(osp.basename(val_data['lq_path'][0]))[0]
            self.feed_data(val_data)
            if self.opt['val'].get('selfensemble_testing', False):
                self.test_selfensemble()
            else:
                self.test()

            visuals = self.get_current_visuals()
            sr_img = tensor2img(visuals['result'])
            if isinstance(sr_img, list):
                sr_img = sr_img[0]
            metric_data['img'] = sr_img
            if 'gt' in visuals:
                gt_img = tensor2img(visuals['gt'])
                if isinstance(gt_img, list):
                    gt_img = gt_img[0]
                metric_data['img2'] = gt_img

            if save_img:
                if self.opt['is_train']:
                    save_img_path = osp.join(self.opt['path']['visualization'], img_name,
                                             f'{img_name}_{current_iter}.png')
                else:
                    suffix = self.opt['val'].get('suffix')
                    tag = suffix if suffix else self.opt['name']
                    save_img_path = osp.join(self.opt['path']['visualization'], dataset_name,
                                             f'{img_name}_{tag}.png')
                imwrite(sr_img, save_img_path)

            if with_metrics:
                for name, opt_ in self.opt['val']['metrics'].items():
                    if str(opt_.get('type', '')).endswith(('_pt', '_jax')):
                        # device-variant metrics evaluate straight from the
                        # on-device output/gt — no numpy round-trip
                        # (reference psnr_ssim.py:51,172 tensor semantics)
                        device_data = {'img': self.output}
                        if 'gt' in self.batch:
                            device_data['img2'] = self.batch['gt']
                        self.metric_results[name] += calculate_metric(device_data, opt_)
                    else:
                        self.metric_results[name] += calculate_metric(metric_data, opt_)
            cnt += 1

        if with_metrics and cnt > 0:
            for metric in self.metric_results.keys():
                self.metric_results[metric] /= cnt
                self._update_best_metric_result(dataset_name, metric,
                                                self.metric_results[metric], current_iter)
            self._log_validation_metric_values(current_iter, dataset_name, tb_logger)

    def _log_validation_metric_values(self, current_iter, dataset_name, tb_logger):
        """(reference sr_model.py:250-263)"""
        log_str = f'Validation {dataset_name}\n'
        for metric, value in self.metric_results.items():
            log_str += f'\t # {metric}: {value:.4f}'
            if dataset_name in self.best_metric_results:
                record = self.best_metric_results[dataset_name][metric]
                log_str += f'\tBest: {record["val"]:.4f} @ {record["iter"]} iter'
            log_str += '\n'
        logger = get_root_logger()
        logger.info(log_str)
        if tb_logger:
            for metric, value in self.metric_results.items():
                tb_logger.add_scalar(f'metrics/{dataset_name}/{metric}', value, current_iter)

    # ---------------------------------------------------------- save/resume
    def save(self, epoch, current_iter):
        """(reference sr_model.py:274-279)"""
        params_dict = {'params': self.state.params}
        if self.state.ema_params is not None:
            params_dict['params_ema'] = self.state.ema_params
        self.save_network(params_dict, 'g', current_iter)
        self.save_training_state(epoch, current_iter, {
            'opt_state_g': self.state.opt_state,
            'step': self.state.step,
            'params': self.state.params,
            'params_ema': (self.state.ema_params if self.state.ema_params is not None else {}),
            'stats': self.state.stats or {},
        })

    def resume_training(self, resume_state):
        """Restore step/params/opt/stats state (reference base_model.py:361-374)."""
        step = jnp.asarray(resume_state['step'], jnp.int32)
        params = resume_state['params']
        ema = resume_state.get('params_ema')
        if ema is not None and (not isinstance(ema, dict) or len(ema) > 0):
            ema_params = ema
        else:
            ema_params = params if self.ema_decay > 0 else None
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self.state.opt_state),
            jax.tree_util.tree_leaves(resume_state['opt_state_g']))
        # BatchNorm-style running stats (DUF/TOF): older states lack the key.
        stats = resume_state.get('stats')
        stats = stats if stats else self.net_stats
        state = TrainState(step=step, params=params, ema_params=ema_params,
                           opt_state=opt_state, stats=stats)
        self.state = replicate(state, self.mesh)
