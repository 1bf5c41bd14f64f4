"""ResShiftModel — latent residual-shifting diffusion SR
(reference: basicsr/models/resshift_model.py:22-334).

A frozen first-stage autoencoder (VQ/KL) defines the latent space; the
UNetModelSwin denoiser is trained on a per-sample random timestep with the
ResShift objective. The whole optimize step — latent encoding, q_sample,
UNet forward, (weighted) MSE, optimizer update — is one jitted program;
sampling runs the p_sample_loop lax.scan and decodes.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..archs import build_network
from ..utils.gaussian_diffusion import create_gaussian_diffusion
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .base_model import TrainState, ema_update, jit_init
from .srrs_model import SRRSModel


class _FirstStage:
    """Bound frozen autoencoder: encode/decode close over fixed params so
    the diffusion engine can call plain functions."""

    def __init__(self, net, params):
        self.net = net
        self.params = params

    def encode(self, x):
        return self.net.apply({'params': self.params}, x, method=type(self.net).encode)

    def decode(self, z):
        return self.net.apply({'params': self.params}, z, method=type(self.net).decode)


@MODEL_REGISTRY.register()
class ResShiftModel(SRRSModel):

    def __init__(self, opt):
        super().__init__(opt)
        # frozen autoencoder (reference :29-44)
        self.first_stage = None
        if 'autoencoder' in self.opt:
            ae_opt = dict(self.opt['autoencoder'])
            self.autoencoder = build_network(ae_opt)
            self.rng, ae_rng = jax.random.split(self.rng)
            in_ch = ae_opt.get('ddconfig', {}).get('in_channels', 3)
            res = ae_opt.get('ddconfig', {}).get('resolution', 64)
            ae_params = jit_init(self.autoencoder.init)(ae_rng, jnp.zeros((1, res, res, in_ch)))['params']
            load_path_ae = self.opt['path'].get('pretrain_network_ae')
            if load_path_ae is not None:
                ae_params = self.load_network(load_path_ae, 'params', True, template=ae_params)
            self.first_stage = _FirstStage(self.autoencoder, ae_params)

        self.base_diffusion = create_gaussian_diffusion(**self.opt['diffusion'])
        if self.is_train:
            self._build_diffusion_train_step()

    def _init_variables(self, init_rng):
        """Denoiser init: (x_t, t[, lq])."""
        net_opt = self.opt['network_g']
        size = net_opt.get('image_size', 64)
        ch = net_opt.get('in_channels', 3)
        x = jnp.zeros((1, size, size, ch), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        if net_opt.get('cond_lq', True):
            lq_size = net_opt.get('lq_size', size)
            lq = jnp.zeros((1, lq_size, lq_size, net_opt.get('lq_channels', ch)), jnp.float32)
            return self.net_g.init(init_rng, x, t, lq=lq)
        return self.net_g.init(init_rng, x, t)

    def init_training_settings(self):
        train_opt = self.opt['train']
        self.ema_decay = train_opt.get('ema_decay', 0)
        self.cri_pix = None
        self.cri_perceptual = None
        self.setup_optimizers()
        # the diffusion train step is built after base_diffusion exists
        self._train_step = None

    def _build_diffusion_train_step(self):
        ema_decay = self.ema_decay

        def unet_apply(params, x, t, lq):
            kwargs = {'lq': lq} if self.opt['network_g'].get('cond_lq', True) else {}
            return self.net_g.apply({'params': params}, x, t, **kwargs)

        @functools.partial(jax.jit, donate_argnums=(0,))
        @self.kernel_scope()
        def train_step(state: TrainState, batch, rng):
            k_t, k_noise, k_loss = jax.random.split(rng, 3)
            bsz = batch['gt'].shape[0]
            # tt/noise are sampled per step like the reference
            # (resshift_model.py:118-133); a batch may carry explicit
            # 'tt'/'noise' instead — the same injection surface the
            # reference's training_losses(noise=...) exposes, used by the
            # torch trajectory-parity test for deterministic replay.
            tt = batch.get('tt')
            if tt is None:
                tt = jax.random.randint(k_t, (bsz,),
                                        0, self.base_diffusion.num_timesteps)

            def loss_fn(params):
                model = lambda x, t, **kw: unet_apply(params, x, t, batch['lq'])  # noqa: E731
                loss_dict, z_t, z0_pred = self.base_diffusion.training_losses(
                    k_noise, model, batch['gt'], batch['lq'], tt,
                    first_stage_model=self.first_stage,
                    noise=batch.get('noise'))
                loss = jnp.mean(loss_dict['mse'])
                return loss, loss_dict

            (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = state.ema_params
            if ema_params is not None:
                ema_params = ema_update(ema_params, params, ema_decay)
            logs = OrderedDict(loss=loss, mse=jnp.mean(loss_dict['mse']))
            # per-recorded-step losses (reference get_record_step_loss :75-111)
            T = self.base_diffusion.num_timesteps
            for step_mark in [1, T // 2 + 1, T]:
                mask = (tt == (step_mark - 1)).astype(jnp.float32)
                denom = jnp.sum(mask) + 1e-4
                logs[f'mse{step_mark}'] = jnp.sum(loss_dict['mse'] * mask) / denom
            new_state = state.replace(step=state.step + 1, params=params,
                                      ema_params=ema_params, opt_state=opt_state)
            return new_state, logs

        self._diff_step = train_step

    def optimize_parameters(self, current_iter):
        self.rng, step_rng = jax.random.split(self.rng)
        self.state, losses = self._diff_step(self.state, self.batch, step_rng)
        self.log_dict = self.reduce_loss_dict(losses)

    # ------------------------------------------------------------------ test
    def _sampling_net(self):
        """Swin UNets default to the Pallas fused window-attention kernel
        (``fused_attn=True``; auto-falls back to XLA off-TPU)."""
        return self.net_g

    def test(self):
        """Full reverse diffusion sampling (reference :175-210)."""
        params = self._test_params()
        lq = self.batch['lq']
        key = (lq.shape, 'sample')
        if key not in self._eval_fns:
            net = self._sampling_net()

            def sample(params, lq, rng):
                model = lambda x, t, **kw: net.apply(  # noqa: E731
                    {'params': params}, x, t,
                    **({'lq': lq} if self.opt['network_g'].get('cond_lq', True) else {}))
                return self.base_diffusion.p_sample_loop(rng, lq, model,
                                                         first_stage_model=self.first_stage)
            self._eval_fns[key] = jax.jit(self.kernel_scope()(sample))
        self.rng, s_rng = jax.random.split(self.rng)
        self.output = self._eval_fns[key](params, lq, s_rng)
