"""Diffusion over frozen align-AE latents
(reference: basicsr/models/align_frozen_diff_model.py:19-246)."""

from __future__ import annotations

import functools
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..archs import build_network
from ..archs.arch_util import resize_bicubic
from ..parallel.mesh import shard_batch
from ..utils.gaussian_diffusion_align import create_gaussian_diffusion_align
from ..utils.registry import MODEL_REGISTRY
from .align_single_model import _center_crop_to
from .base_model import TrainState, ema_update, jit_init
from .srrs_l2s_model import L2SSingleModel


class _AlignFirstStage:
    """Frozen AlignAutoencoder bound to fixed params.

    The reference model imports a ``gaussian_diffusion_registration`` module
    that is absent from the reference tree, so the LQ-conditioning encode
    path has to be inferred. The align AE consumes ``lq_up ‖ gt`` (2x the
    band count); when only the LQ side is available (conditioning/sampling)
    we fill the GT slot with ``lq_up`` itself — consistent with how the
    jointly-trained variant substitutes an LR encoder for the missing GT.
    """

    def __init__(self, net, params, in_ch, latent_size=None):
        self.net = net
        self.params = params
        self.in_ch = in_ch
        self.latent_size = latent_size

    def encode(self, x):
        if x.shape[-1] * 2 == self.in_ch:
            x = jnp.concatenate([x, x], axis=-1)
        out = self.net.apply({'params': self.params}, x, method=type(self.net).encode)
        # the AlignNet encoder's asymmetric padding grows the latent grid by
        # one; center-crop to the UNet's (window-divisible) latent size
        if self.latent_size is not None and out.shape[1] > self.latent_size:
            return _center_crop_to(out, jnp.zeros((1, self.latent_size, self.latent_size, 1)))
        return out

    def decode(self, z):
        return self.net.apply({'params': self.params}, z, method=type(self.net).decode)


@MODEL_REGISTRY.register()
class AlignFrozenDiffModel(L2SSingleModel):

    def __init__(self, opt):
        super().__init__(opt)
        ae_opt = dict(self.opt['autoencoder'])
        self.autoencoder = build_network(ae_opt)
        self.rng, ae_rng = jax.random.split(self.rng)
        in_ch = ae_opt.get('num_in_ch', 12)
        ae_params = jit_init(self.autoencoder.init)(ae_rng, jnp.zeros((1, 24, 24, in_ch)))['params']
        load_path_ae = self.opt['path'].get('pretrain_network_ae')
        if load_path_ae is not None:
            ae_params = self.load_network(load_path_ae, 'params', True, template=ae_params)
        self.first_stage = _AlignFirstStage(self.autoencoder, ae_params, in_ch,
                                            latent_size=self.opt['network_g'].get('image_size'))
        self.base_diffusion = create_gaussian_diffusion_align(**self.opt['diffusion'])
        if self.is_train:
            self._build_diff_step()

    def _init_variables(self, init_rng):
        net_opt = self.opt['network_g']
        size = net_opt.get('image_size', 64)
        ch = net_opt.get('in_channels', 6)
        x = jnp.zeros((1, size, size, ch), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        if net_opt.get('cond_lq', True):
            lq = jnp.zeros((1, net_opt.get('lq_size', size), net_opt.get('lq_size', size),
                            net_opt.get('lq_channels', 6)), jnp.float32)
            return self.net_g.init(init_rng, x, t, lq=lq)
        return self.net_g.init(init_rng, x, t)

    def init_training_settings(self):
        train_opt = self.opt['train']
        self.ema_decay = train_opt.get('ema_decay', 0)
        self.cri_pix = None
        self.cri_perceptual = None
        self.setup_optimizers()

    def feed_data(self, data):
        self.batch_meta = {'sample_path': data.get('sample_path'),
                           'img_name': data.get('img_name')}
        lq = jnp.asarray(np.concatenate([np.asarray(data['lq']['rgb']),
                                         np.asarray(data['lq']['nss'])], axis=-1))
        batch = {'lq': np.asarray(lq)}
        if 'gt' in data:
            gt_rgb = jnp.asarray(np.asarray(data['gt']['rgb']))
            gt_nss = jnp.asarray(np.asarray(data['gt']['nss']))
            gt = jnp.concatenate([gt_rgb, resize_bicubic(gt_nss, 2.0)], axis=-1)
            lq_up = resize_bicubic(lq, 3.0)
            batch['gt'] = np.asarray(gt)
            batch['reg_input'] = np.asarray(jnp.concatenate([lq_up, gt], axis=-1))
        self.batch = shard_batch(batch, self.mesh)

    def _build_diff_step(self):
        ema_decay = self.ema_decay
        cond_lq = self.opt['network_g'].get('cond_lq', True)

        @functools.partial(jax.jit, donate_argnums=(0,))
        @self.kernel_scope()
        def step(state: TrainState, batch, rng):
            k_t, k_noise = jax.random.split(rng)
            bsz = batch['gt'].shape[0]
            tt = jax.random.randint(k_t, (bsz,), 0, self.base_diffusion.num_timesteps)

            def loss_fn(params):
                kwargs = {'lq': batch['lq']} if cond_lq else {}
                model = lambda x, t, **kw: self.net_g.apply(  # noqa: E731
                    {'params': params}, x, t, **kwargs)
                loss_dict, z_t, z0_pred = self.base_diffusion.training_losses(
                    k_noise, model, batch['reg_input'], batch['lq'], tt,
                    first_stage_model=self.first_stage)
                return jnp.mean(loss_dict['mse']), loss_dict

            (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = state.ema_params
            if ema_params is not None:
                ema_params = ema_update(ema_params, params, ema_decay)
            logs = OrderedDict(loss=loss, mse=jnp.mean(loss_dict['mse']))
            return state.replace(step=state.step + 1, params=params,
                                 ema_params=ema_params, opt_state=opt_state), logs

        self._diff_step = step

    def optimize_parameters(self, current_iter):
        self.rng, step_rng = jax.random.split(self.rng)
        self.state, losses = self._diff_step(self.state, self.batch, step_rng)
        self.log_dict = self.reduce_loss_dict(losses)

    def test(self):
        params = self._test_params()
        lq = self.batch['lq']
        cond_lq = self.opt['network_g'].get('cond_lq', True)
        key = (lq.shape, 'sample')
        if key not in self._eval_fns:
            def sample(params, lq, rng):
                kwargs = {'lq': lq} if cond_lq else {}
                model = lambda x, t, **kw: self.net_g.apply(  # noqa: E731
                    {'params': params}, x, t, **kwargs)
                return self.base_diffusion.p_sample_loop(rng, lq, model,
                                                         first_stage_model=self.first_stage)
            self._eval_fns[key] = jax.jit(self.kernel_scope()(sample))
        self.rng, s_rng = jax.random.split(self.rng)
        out = self._eval_fns[key](params, lq, s_rng)
        self.output = _center_crop_to(out, self.batch['gt']) if 'gt' in self.batch else out
