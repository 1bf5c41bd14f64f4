"""Jointly-trained align-AE + LR-encoder + diffusion UNet
(reference: basicsr/models/align_joint_diff_model.py:20-276).

Four losses in one jitted step: alignment (encoder latent vs LR latent),
diffusion (z0 prediction vs detached z0), reconstruction (AE decode vs GT),
and SR (decoded z0 prediction vs GT). Gradients flow through the align
autoencoder and LR encoder (``no_grad=False`` encode paths)."""

from __future__ import annotations

import functools
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import build_loss
from ..utils.gaussian_diffusion_align import create_gaussian_diffusion_align
from ..utils.registry import MODEL_REGISTRY
from .align_frozen_diff_model import AlignFrozenDiffModel
from .align_single_model import _center_crop_to
from .base_model import TrainState, ema_update


@MODEL_REGISTRY.register()
class AlignJointDiffModel(AlignFrozenDiffModel):

    def __init__(self, opt):
        # no separate frozen autoencoder — the AE lives inside net_g
        self.opt_no_ae = True
        # bypass AlignFrozenDiffModel.__init__'s frozen-AE setup
        from .srrs_l2s_model import L2SSingleModel
        L2SSingleModel.__init__(self, opt)
        self.base_diffusion = create_gaussian_diffusion_align(**self.opt['diffusion'])
        if self.is_train:
            self._build_diff_step()

    def _init_variables(self, init_rng):
        net_opt = self.opt['network_g']
        u = net_opt['unet_args']
        size = u.get('image_size', 64)
        ch = u.get('in_channels', 6)
        x = jnp.zeros((1, size, size, ch), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        lq = jnp.zeros((1, size, size, ch), jnp.float32)
        return self.net_g.init(init_rng, x, t, lq=lq)

    def init_training_settings(self):
        train_opt = self.opt['train']
        self.ema_decay = train_opt.get('ema_decay', 0)
        self.cri_pix = None
        self.cri_perceptual = None
        self.align_loss = build_loss(train_opt['encoder_opt']) if train_opt.get('encoder_opt') else None
        self.reconstruction_loss = build_loss(train_opt['decoder_opt']) if train_opt.get('decoder_opt') else None
        self.sr_loss = build_loss(train_opt['sr_opt']) if train_opt.get('sr_opt') else None
        self.diffusion_loss = build_loss(train_opt['diffusion_opt']) if train_opt.get('diffusion_opt') else None
        self.setup_optimizers()

    def _build_diff_step(self):
        ema_decay = self.ema_decay
        cond_lq = self.opt['network_g']['unet_args'].get('cond_lq', True)
        net_cls = type(self.net_g)

        @functools.partial(jax.jit, donate_argnums=(0,))
        @self.kernel_scope()
        def step(state: TrainState, batch, rng):
            k_t, k_noise = jax.random.split(rng)
            bsz = batch['gt'].shape[0]
            tt = jax.random.randint(k_t, (bsz,), 0, self.base_diffusion.num_timesteps)

            def loss_fn(params):
                def apply(method, *args):
                    return self.net_g.apply({'params': params}, *args, method=method)

                z_0 = apply(net_cls.apply_ae_encode, batch['reg_input'])
                from ..archs.arch_util import resize_bicubic
                lq_up = resize_bicubic(batch['lq'], float(self.base_diffusion.sf))
                z_lr = apply(net_cls.apply_lr_encode, lq_up)
                # match latent grids (the AlignNet padding quirk grows z_0)
                # and crop to the UNet's window-divisible image_size
                size = self.opt['network_g']['unet_args'].get('image_size')
                m = min(z_0.shape[1], z_lr.shape[1], size or 10**9)
                ref = jnp.zeros((1, m, m, 1))
                z_0c = _center_crop_to(z_0, ref)
                z_lrc = _center_crop_to(z_lr, ref)

                model = lambda x, t, **kw: apply(net_cls.apply_unet, x, t,  # noqa: E731
                                                 z_lrc if cond_lq else None)
                z0_pred = self.base_diffusion.denoise_prediction(
                    k_noise, model, jax.lax.stop_gradient(z_0c),
                    jax.lax.stop_gradient(z_lrc), tt)

                rec = apply(net_cls.apply_ae_decode, z_0c)
                sr = apply(net_cls.apply_ae_decode, z0_pred)
                rec = _center_crop_to(rec, batch['gt'])
                sr = _center_crop_to(sr, batch['gt'])

                losses = OrderedDict()
                total = 0.
                if self.align_loss is not None:
                    losses['align'] = self.align_loss(z_0c, jax.lax.stop_gradient(z_lrc))
                    total += losses['align']
                if self.diffusion_loss is not None:
                    losses['diffusion'] = self.diffusion_loss(z0_pred, jax.lax.stop_gradient(z_0c))
                    total += losses['diffusion']
                if self.reconstruction_loss is not None:
                    losses['reconstruction'] = self.reconstruction_loss(rec, batch['gt'])
                    total += losses['reconstruction']
                if self.sr_loss is not None:
                    losses['sr'] = self.sr_loss(sr, batch['gt'])
                    total += losses['sr']
                return total, losses

            (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = state.ema_params
            if ema_params is not None:
                ema_params = ema_update(ema_params, params, ema_decay)
            losses['loss'] = loss
            return state.replace(step=state.step + 1, params=params,
                                 ema_params=ema_params, opt_state=opt_state), losses

        self._diff_step = step

    def test(self):
        params = self._test_params()
        lq = self.batch['lq']
        net_cls = type(self.net_g)
        cond_lq = self.opt['network_g']['unet_args'].get('cond_lq', True)
        key = (lq.shape, 'sample')
        if key not in self._eval_fns:
            def sample(params, lq, rng):
                def apply(method, *args):
                    return self.net_g.apply({'params': params}, *args, method=method)

                from ..archs.arch_util import resize_bicubic
                lq_up = resize_bicubic(lq, float(self.base_diffusion.sf))
                z_lr = apply(net_cls.apply_lr_encode, lq_up)
                size = self.opt['network_g']['unet_args'].get('image_size')
                if size and z_lr.shape[1] > size:
                    z_lr = _center_crop_to(z_lr, jnp.zeros((1, size, size, 1)))
                model = lambda x, t, **kw: apply(net_cls.apply_unet, x, t,  # noqa: E731
                                                 z_lr if cond_lq else None)

                class _Dec:
                    encode = staticmethod(lambda x: x)

                    @staticmethod
                    def decode(z):
                        return apply(net_cls.apply_ae_decode, z)

                k1, k2 = jax.random.split(rng)
                noise = jax.random.normal(k1, z_lr.shape, z_lr.dtype)
                z_sample = self.base_diffusion.prior_sample(z_lr, noise)
                indices = np.asarray(list(range(self.base_diffusion.num_timesteps))[::-1])

                def step_fn(carry, idx_key):
                    z, = carry
                    i, k = idx_key
                    t = jnp.full((z_lr.shape[0],), i, jnp.int32)
                    out = self.base_diffusion.p_sample(k, model, z, z_lr, t)
                    return (out['sample'],), None

                keys = jax.random.split(k2, len(indices))
                (z_final,), _ = jax.lax.scan(step_fn, (z_sample,), (jnp.asarray(indices), keys))
                return apply(net_cls.apply_ae_decode, z_final)
            self._eval_fns[key] = jax.jit(self.kernel_scope()(sample))
        self.rng, s_rng = jax.random.split(self.rng)
        out = self._eval_fns[key](params, lq, s_rng)
        self.output = _center_crop_to(out, self.batch['gt']) if 'gt' in self.batch else out
