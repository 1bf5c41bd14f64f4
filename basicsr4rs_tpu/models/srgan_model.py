"""SRGANModel — GAN-based SR training (reference: basicsr/models/srgan_model.py:12-149).

One jitted step performs the G update (gated by ``net_d_iters`` /
``net_d_init_iters`` via ``lax.cond``) followed by the D update on real and
detached-fake batches — the functional analog of the reference's freeze/
unfreeze dance: G's gradient simply isn't taken w.r.t. D's params.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..archs import build_network
from ..losses import build_loss
from ..utils.registry import MODEL_REGISTRY
from ..parallel.mesh import replicate
from .base_model import (TrainState, advance_schedule_count, build_optimizer, jit_init,
                         ema_update)
from .lr_scheduler import build_schedule
from .sr_model import SRModel


@MODEL_REGISTRY.register()
class SRGANModel(SRModel):

    def init_training_settings(self):
        train_opt = self.opt['train']
        self.ema_decay = train_opt.get('ema_decay', 0)

        # Discriminator (reference srgan_model.py:23-36).
        self.net_d = build_network(self.opt['network_d'])
        self.rng, d_rng = jax.random.split(self.rng)
        d_vars = jit_init(self._init_d)(d_rng, self._d_dummy_input())
        d_params = d_vars['params']
        self.d_stats = dict(d_vars.get('batch_stats', {}))

        load_path = self.opt['path'].get('pretrain_network_d')
        if load_path is not None:
            d_params = self.load_network(load_path, self.opt['path'].get('param_key_d', 'params'),
                                         self.opt['path'].get('strict_load_d', True),
                                         template=d_params,
                                         rules=getattr(type(self.net_d), 'TORCH_KEY_RULES', None))

        # Losses (reference srgan_model.py:38-60).
        self.cri_pix = build_loss(train_opt['pixel_opt']) if train_opt.get('pixel_opt') else None
        self.cri_perceptual = (build_loss(train_opt['perceptual_opt'])
                               if train_opt.get('perceptual_opt') else None)
        self.cri_ldl = build_loss(train_opt['ldl_opt']) if train_opt.get('ldl_opt') else None
        if self.cri_ldl is not None and self.ema_decay <= 0:
            # the LDL artifact map is computed against the EMA output
            # (reference realesrgan_model.py:211-226 uses net_g_ema)
            raise ValueError('ldl_opt requires ema_decay > 0.')
        self.cri_gan = build_loss(train_opt['gan_opt'])
        self.net_d_iters = train_opt.get('net_d_iters', 1)
        self.net_d_init_iters = train_opt.get('net_d_init_iters', 0)

        # Optimizers + schedules for G and D (reference :62-76).
        optim_g = dict(train_opt['optim_g'])
        optim_d = dict(train_opt['optim_d'])
        sched_g = build_schedule(optim_g.get('lr', 1e-4), train_opt.get('scheduler'),
                                 train_opt.get('warmup_iter', -1))
        sched_d = build_schedule(optim_d.get('lr', 1e-4), train_opt.get('scheduler'),
                                 train_opt.get('warmup_iter', -1))
        self.tx_g = build_optimizer(optim_g, sched_g)
        self.tx_d = build_optimizer(optim_d, sched_d)
        self.schedulers_info = [('g', sched_g), ('d', sched_d)]

        ema_params = (jax.tree_util.tree_map(jnp.array, self.params)
                      if self.ema_decay > 0 else None)
        g_state = TrainState(step=jnp.zeros((), jnp.int32), params=self.params,
                             ema_params=ema_params, opt_state=self.tx_g.init(self.params))
        d_state = TrainState(step=jnp.zeros((), jnp.int32), params=d_params,
                             ema_params=None, opt_state=self.tx_d.init(d_params),
                             stats=self.d_stats)
        self.state = replicate(g_state, self.mesh)
        self.d_state = replicate(d_state, self.mesh)
        self._build_train_step()

    def _d_dummy_input(self):
        d_in_ch = self.opt['network_d'].get('num_in_ch', 3)
        d_size = self.opt['network_d'].get('input_size', 128)
        return jnp.zeros((1, d_size, d_size, d_in_ch), jnp.float32)

    def _init_d(self, rng, dummy):
        try:
            return self.net_d.init(rng, dummy, train=True)
        except TypeError:
            return self.net_d.init(rng, dummy)

    def _d_apply(self, d_params, d_stats, x, train: bool):
        """Apply the discriminator; returns (pred, new_stats)."""
        variables = {'params': d_params}
        if d_stats:
            variables['batch_stats'] = d_stats
        try:
            if d_stats:
                pred, updates = self.net_d.apply(variables, x, train=train,
                                                 mutable=['batch_stats'])
                return pred, updates.get('batch_stats', d_stats)
            pred = self.net_d.apply(variables, x)
            return pred, d_stats
        except TypeError:
            pred = self.net_d.apply(variables, x)
            return pred, d_stats

    def _gan_gt(self, batch):
        """The real sample shown to D (Real-ESRGAN overrides for USM flags)."""
        return batch['gt']

    # ------------------------------------------------------------- G losses
    def _g_gan_loss(self, output, gt, d_params, d_stats):
        """Standard GAN generator loss (overridden by ESRGAN)."""
        fake_g_pred, _ = self._d_apply(d_params, d_stats, output, train=True)
        return self.cri_gan(fake_g_pred, True, is_disc=False)

    def _d_losses(self, d_params, d_stats, gt, output_detached):
        """(l_d_total, logs, new_stats). Standard real/fake hinge-style split."""
        real_d_pred, d_stats = self._d_apply(d_params, d_stats, gt, train=True)
        l_d_real = self.cri_gan(real_d_pred, True, is_disc=True)
        fake_d_pred, d_stats = self._d_apply(d_params, d_stats, output_detached, train=True)
        l_d_fake = self.cri_gan(fake_d_pred, False, is_disc=True)
        logs = OrderedDict(l_d_real=l_d_real, l_d_fake=l_d_fake,
                           out_d_real=jnp.mean(real_d_pred), out_d_fake=jnp.mean(fake_d_pred))
        return l_d_real + l_d_fake, logs, d_stats

    def _ldl_loss(self, output, gt, lq, ema_params):
        """LDL artifact-weighted pixel loss (reference realesrgan_model.py:
        211-226): artifact map from the live output vs the EMA output."""
        from ..losses.loss_util import get_refined_artifact_map
        output_ema = jax.lax.stop_gradient(
            self.net_g.apply({'params': ema_params}, lq))
        pixel_weight = get_refined_artifact_map(gt, output, output_ema, 7)
        return self.cri_ldl(pixel_weight * output, pixel_weight * gt)

    def _g_losses(self, g_params, batch, d_params, d_stats, ema_params=None):
        output = self.net_g.apply({'params': g_params}, batch['lq'])
        losses = OrderedDict()
        total = 0.
        if self.cri_pix is not None:
            l_g_pix = self.cri_pix(output, batch['gt'])
            losses['l_g_pix'] = l_g_pix
            total += l_g_pix
        if self.cri_ldl is not None:
            l_g_ldl = self._ldl_loss(output, batch['gt'], batch['lq'], ema_params)
            losses['l_g_ldl'] = l_g_ldl
            total += l_g_ldl
        if self.cri_perceptual is not None:
            l_percep, l_style = self.cri_perceptual(output, batch['gt'])
            if l_percep is not None:
                losses['l_g_percep'] = l_percep
                total += l_percep
            if l_style is not None:
                losses['l_g_style'] = l_style
                total += l_style
        l_g_gan = self._g_gan_loss(output, batch['gt'], d_params, d_stats)
        losses['l_g_gan'] = l_g_gan
        total += l_g_gan
        losses['l_g_total'] = total
        return total, (losses, output)

    def _build_train_step(self):
        ema_decay = self.ema_decay
        net_d_iters = self.net_d_iters
        net_d_init_iters = self.net_d_init_iters

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        @self.kernel_scope()
        def gan_step(g_state: TrainState, d_state: TrainState, batch):
            step1 = g_state.step + 1
            # ---- G phase (reference srgan_model.py:85-117)
            (_, (g_logs, output)), g_grads = jax.value_and_grad(
                self._g_losses, has_aux=True)(g_state.params, batch, d_state.params,
                                              d_state.stats, g_state.ema_params)
            do_g = jnp.logical_and(step1 % net_d_iters == 0, step1 > net_d_init_iters)

            def apply_g(_):
                updates, opt_state = self.tx_g.update(g_grads, g_state.opt_state, g_state.params)
                return optax.apply_updates(g_state.params, updates), opt_state

            def skip_g(_):
                # Reference leaves optim_g untouched on gated iterations but
                # steps the LR scheduler every iteration: keep Adam moments/
                # counts as-is, advance only the schedule position.
                return g_state.params, advance_schedule_count(g_state.opt_state)

            g_params, g_opt_state = jax.lax.cond(do_g, apply_g, skip_g, None)
            ema_params = g_state.ema_params
            if ema_params is not None:
                ema_params = ema_update(ema_params, g_params, ema_decay)

            # ---- D phase (reference srgan_model.py:120-141)
            output_detached = jax.lax.stop_gradient(output)
            d_real_target = self._gan_gt(batch)
            (_, (d_logs, d_stats)), d_grads = jax.value_and_grad(
                lambda p: self._pack_d(self._d_losses(p, d_state.stats, d_real_target,
                                                      output_detached)),
                has_aux=True)(d_state.params)
            d_updates, d_opt_state = self.tx_d.update(d_grads, d_state.opt_state, d_state.params)
            d_params = optax.apply_updates(d_state.params, d_updates)

            logs = OrderedDict()
            logs.update(g_logs)
            logs.update(d_logs)
            new_g = g_state.replace(step=step1, params=g_params, ema_params=ema_params,
                                    opt_state=g_opt_state)
            new_d = d_state.replace(step=d_state.step + 1, params=d_params,
                                    opt_state=d_opt_state, stats=d_stats)
            return new_g, new_d, logs

        self._train_step_gan = gan_step

    @staticmethod
    def _pack_d(ret):
        total, logs, stats = ret
        return total, (logs, stats)

    def optimize_parameters(self, current_iter):
        self.state, self.d_state, losses = self._train_step_gan(self.state, self.d_state, self.batch)
        self.log_dict = self.reduce_loss_dict(losses)

    def save(self, epoch, current_iter):
        """Save G (+EMA) and D (reference srgan_model.py:143-149)."""
        params_dict = {'params': self.state.params}
        if self.state.ema_params is not None:
            params_dict['params_ema'] = self.state.ema_params
        self.save_network(params_dict, 'g', current_iter)
        self.save_network({'params': self.d_state.params}, 'd', current_iter)
        self.save_training_state(epoch, current_iter, {
            'opt_state_g': self.state.opt_state,
            'step': self.state.step,
            'params': self.state.params,
            'params_ema': (self.state.ema_params if self.state.ema_params is not None else {}),
            'params_d': self.d_state.params,
            'opt_state_d': self.d_state.opt_state,
            'stats_d': self.d_state.stats or {},
        })

    def resume_training(self, resume_state):
        super().resume_training(resume_state)
        d_opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self.d_state.opt_state),
            jax.tree_util.tree_leaves(resume_state['opt_state_d']))
        d_state = TrainState(step=jnp.asarray(resume_state['step'], jnp.int32),
                             params=resume_state['params_d'], ema_params=None,
                             opt_state=d_opt_state,
                             stats=resume_state.get('stats_d') or {})
        self.d_state = replicate(d_state, self.mesh)
