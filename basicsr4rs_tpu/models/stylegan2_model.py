"""StyleGAN2Model — non-saturating GAN with lazy regularization
(reference: basicsr/models/stylegan2_model.py:18-283).

One jitted step runs: D logistic step (+ R1 every ``net_d_reg_every`` iters
via ``lax.cond``), then G non-saturating step (+ path-length regularization
every ``net_g_reg_every``). ``mean_path_length`` is a scalar carried in the
G state; EMA decay is the reference's 0.5^(32/(10k*ratio)).
"""

from __future__ import annotations

import functools
import math
from collections import OrderedDict
from os import path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..archs import build_network
from ..losses import build_loss
from ..losses.gan_loss import g_path_regularize, r1_penalty
from ..parallel.mesh import replicate, shard_batch
from ..utils.img_util import imwrite, tensor2img
from ..utils.registry import MODEL_REGISTRY
from .base_model import BaseModel, TrainState, build_optimizer, ema_update, jit_init
from .lr_scheduler import constant_lr


@MODEL_REGISTRY.register()
class StyleGAN2Model(BaseModel):

    def __init__(self, opt):
        super().__init__(opt)
        self.net_g = build_network(opt['network_g'])
        self.num_style_feat = opt['network_g']['num_style_feat']

        self.rng, init_rng, noise_rng, fix_rng = jax.random.split(self.rng, 4)
        z = jnp.zeros((1, self.num_style_feat), jnp.float32)
        variables = jit_init(self.net_g.init)({'params': init_rng, 'noise': noise_rng}, [z])
        self.params = variables['params']
        self.g_noises = dict(variables.get('noises', {}))
        self.print_network(self.net_g, self.params)

        load_path = self.opt['path'].get('pretrain_network_g')
        if load_path is not None:
            self.params = self.load_network(load_path, self.opt['path'].get('param_key_g', 'params'),
                                            self.opt['path'].get('strict_load_g', True),
                                            template=self.params,
                                            rules=type(self.net_g).TORCH_KEY_RULES)

        num_val_samples = self.opt.get('val', {}).get('num_val_samples', 16)
        self.fixed_sample = jax.random.normal(fix_rng, (num_val_samples, self.num_style_feat))

        self._eval_fns = {}
        if self.is_train:
            self.init_training_settings()
        else:
            self.state = TrainState(step=jnp.zeros((), jnp.int32), params=self.params,
                                    ema_params=self.params, opt_state=())

    # ------------------------------------------------------------- training
    def init_training_settings(self):
        train_opt = self.opt['train']
        self.net_d = build_network(self.opt['network_d'])
        self.rng, d_rng = jax.random.split(self.rng)
        out_size = self.opt['network_d']['out_size']
        d_params = jit_init(self.net_d.init)(d_rng, jnp.zeros((2, out_size, out_size, 3)))['params']
        load_path = self.opt['path'].get('pretrain_network_d')
        if load_path is not None:
            d_params = self.load_network(load_path, self.opt['path'].get('param_key_d', 'params'),
                                         self.opt['path'].get('strict_load_d', True),
                                         template=d_params)

        self.cri_gan = build_loss(train_opt['gan_opt'])
        self.r1_reg_weight = train_opt['r1_reg_weight']
        self.path_reg_weight = train_opt['path_reg_weight']
        self.net_g_reg_every = train_opt['net_g_reg_every']
        self.net_d_reg_every = train_opt['net_d_reg_every']
        self.mixing_prob = train_opt['mixing_prob']
        self.path_batch_shrink = train_opt.get('path_batch_shrink', 2)

        # reference EMA decay 0.5^(32/10k) applied per-iteration (:75)
        self.ema_decay = 0.5 ** (32 / (10 * 1000))

        # lazy-regularization-adjusted Adam (reference :88-140)
        g_ratio = self.net_g_reg_every / (self.net_g_reg_every + 1)
        d_ratio = self.net_d_reg_every / (self.net_d_reg_every + 1)
        lr_g = train_opt['optim_g']['lr'] * g_ratio
        lr_d = train_opt['optim_d']['lr'] * d_ratio
        self.tx_g = optax.adam(constant_lr(lr_g), b1=0**g_ratio, b2=0.99**g_ratio)
        self.tx_d = optax.adam(constant_lr(lr_d), b1=0**d_ratio, b2=0.99**d_ratio)
        self.schedulers_info = [('g', constant_lr(lr_g)), ('d', constant_lr(lr_d))]

        g_state = TrainState(step=jnp.zeros((), jnp.int32), params=self.params,
                             ema_params=jax.tree_util.tree_map(jnp.array, self.params),
                             opt_state=self.tx_g.init(self.params),
                             stats={'mean_path_length': jnp.zeros(())})
        d_state = TrainState(step=jnp.zeros((), jnp.int32), params=d_params,
                             ema_params=None, opt_state=self.tx_d.init(d_params))
        self.state = replicate(g_state, self.mesh)
        self.d_state = replicate(d_state, self.mesh)
        self._build_train_step()

    def _g_apply(self, params, styles, rng, return_latents=False):
        return self.net_g.apply({'params': params}, styles, rngs={'noise': rng},
                                return_latents=return_latents)

    def _mixing_noise(self, key, batch):
        k1, k2, k3 = jax.random.split(key, 3)
        z1 = jax.random.normal(k1, (batch, self.num_style_feat))
        z2 = jax.random.normal(k2, (batch, self.num_style_feat))
        use_mix = jax.random.uniform(k3, ()) < self.mixing_prob
        # Both branches traced; mixing selects the second code (zeroed when
        # unused so a single graph serves both cases).
        return [z1, jnp.where(use_mix, z2, z1)]

    def _build_train_step(self):
        d_reg_every = self.net_d_reg_every
        g_reg_every = self.net_g_reg_every
        ema_decay = self.ema_decay

        # No buffer donation here: JAX's constant cache can alias the zero
        # scalars across the two states (double-donation error); params
        # buffers still get reused by XLA where safe.
        @jax.jit
        @self.kernel_scope()
        def gan_step(g_state, d_state, real_img, rng):
            step1 = g_state.step + 1
            batch = real_img.shape[0]
            keys = jax.random.split(rng, 8)

            # ---------------- D step (reference :150-168)
            noise = self._mixing_noise(keys[0], batch)
            fake_img, _ = self._g_apply(g_state.params, noise, keys[1])
            fake_img = jax.lax.stop_gradient(fake_img)

            def d_loss_fn(d_params):
                fake_pred = self.net_d.apply({'params': d_params}, fake_img)
                real_pred = self.net_d.apply({'params': d_params}, real_img)
                l_d = self.cri_gan(real_pred, True, is_disc=True) + \
                    self.cri_gan(fake_pred, False, is_disc=True)
                return l_d, (jnp.mean(real_pred), jnp.mean(fake_pred))

            (l_d, (real_score, fake_score)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_state.params)

            # lazy R1 (reference :169-186)
            def r1_grads_fn(d_params):
                def d_fn(img):
                    return self.net_d.apply({'params': d_params}, img)
                l_r1 = r1_penalty(d_fn, real_img)
                return (self.r1_reg_weight / 2 * l_r1 * d_reg_every), l_r1

            def with_r1(_):
                (l_r1_w, l_r1), r1_g = jax.value_and_grad(r1_grads_fn, has_aux=True)(d_state.params)
                return jax.tree_util.tree_map(jnp.add, d_grads, r1_g), l_r1

            def no_r1(_):
                return d_grads, jnp.zeros(())

            d_grads2, l_d_r1 = jax.lax.cond(step1 % d_reg_every == 0, with_r1, no_r1, None)
            d_updates, d_opt_state = self.tx_d.update(d_grads2, d_state.opt_state, d_state.params)
            d_params = optax.apply_updates(d_state.params, d_updates)

            # ---------------- G step (reference :188-215)
            noise = self._mixing_noise(keys[2], batch)

            def g_loss_fn(g_params):
                fake, _ = self._g_apply(g_params, noise, keys[3])
                fake_pred = self.net_d.apply({'params': d_params}, fake)
                return self.cri_gan(fake_pred, True, is_disc=False)

            l_g, g_grads = jax.value_and_grad(g_loss_fn)(g_state.params)

            # lazy path-length regularization (reference :216-235)
            path_batch = max(1, batch // self.path_batch_shrink)
            mpl = g_state.stats['mean_path_length']

            def path_fn(g_params):
                noise_p = self._mixing_noise(keys[4], path_batch)

                def fake_from_latent(latent):
                    img, _ = self.net_g.apply({'params': g_params}, latent,
                                              input_is_latent=True,
                                              rngs={'noise': keys[5]})
                    return img

                _, latents = self._g_apply(g_params, noise_p, keys[5], return_latents=True)
                l_path, path_lengths, new_mpl = g_path_regularize(
                    fake_from_latent, latents, mpl, keys[6])
                return self.path_reg_weight * g_reg_every * l_path, (path_lengths, new_mpl)

            def with_path(_):
                (l_p, (pl, new_mpl)), p_grads = jax.value_and_grad(
                    path_fn, has_aux=True)(g_state.params)
                return (jax.tree_util.tree_map(jnp.add, g_grads, p_grads), l_p,
                        jnp.mean(pl), new_mpl)

            def no_path(_):
                return g_grads, jnp.zeros(()), jnp.zeros(()), mpl

            g_grads2, l_g_path, path_len, new_mpl = jax.lax.cond(
                step1 % g_reg_every == 0, with_path, no_path, None)
            g_updates, g_opt_state = self.tx_g.update(g_grads2, g_state.opt_state, g_state.params)
            g_params = optax.apply_updates(g_state.params, g_updates)
            ema_params = ema_update(g_state.ema_params, g_params, ema_decay)

            logs = OrderedDict(l_d=l_d, real_score=real_score, fake_score=fake_score,
                               l_d_r1=l_d_r1, l_g=l_g, l_g_path=l_g_path,
                               path_length=path_len)
            new_g = g_state.replace(step=step1, params=g_params, ema_params=ema_params,
                                    opt_state=g_opt_state,
                                    stats={'mean_path_length': new_mpl})
            new_d = d_state.replace(step=d_state.step + 1, params=d_params,
                                    opt_state=d_opt_state)
            return new_g, new_d, logs

        self._train_step_gan = gan_step

    def feed_data(self, data):
        batch = {'gt': np.asarray(data['gt'])} if isinstance(data.get('gt'), np.ndarray) \
            else {k: v for k, v in data.items() if not isinstance(v, (str, list))}
        self.batch = shard_batch({'gt': np.asarray(data['gt'])}, self.mesh)

    def optimize_parameters(self, current_iter):
        self.rng, step_rng = jax.random.split(self.rng)
        self.state, self.d_state, losses = self._train_step_gan(
            self.state, self.d_state, self.batch['gt'], step_rng)
        self.log_dict = self.reduce_loss_dict(losses)

    def current_step(self) -> int:
        return int(self.state.step)

    # ----------------------------------------------------------------- eval
    def test(self):
        """Sample with EMA params on the fixed latents (reference :257-261)."""
        key = jax.random.PRNGKey(0)
        img, _ = self.net_g.apply({'params': self.state.ema_params}, [self.fixed_sample],
                                  rngs={'noise': key})
        self.output = img

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        """(reference :266-283): sample a fixed grid and save it."""
        self.test()
        result = tensor2img(self.output, min_max=(-1, 1))
        if not isinstance(result, list):
            result = [result]
        grid = np.concatenate(result[:4], axis=1)
        if self.opt['is_train']:
            save_img_path = osp.join(self.opt['path']['visualization'], 'train',
                                     f'train_{current_iter}.png')
        else:
            save_img_path = osp.join(self.opt['path']['visualization'], 'test',
                                     f'test_{self.opt["name"]}.png')
        imwrite(grid, save_img_path)

    def dist_validation(self, dataloader, current_iter, tb_logger, save_img):
        if self.opt['rank'] == 0:
            self.nondist_validation(dataloader, current_iter, tb_logger, save_img)

    # ---------------------------------------------------------- save/resume
    def save(self, epoch, current_iter):
        self.save_network({'params': self.state.params, 'params_ema': self.state.ema_params},
                          'g', current_iter)
        self.save_network({'params': self.d_state.params}, 'd', current_iter)
        self.save_training_state(epoch, current_iter, {
            'step': self.state.step,
            'params': self.state.params,
            'params_ema': self.state.ema_params,
            'opt_state_g': self.state.opt_state,
            'mean_path_length': self.state.stats['mean_path_length'],
            'params_d': self.d_state.params,
            'opt_state_d': self.d_state.opt_state,
        })

    def resume_training(self, resume_state):
        g_opt = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self.state.opt_state),
            jax.tree_util.tree_leaves(resume_state['opt_state_g']))
        d_opt = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self.d_state.opt_state),
            jax.tree_util.tree_leaves(resume_state['opt_state_d']))
        step = jnp.asarray(resume_state['step'], jnp.int32)
        self.state = replicate(TrainState(
            step=step, params=resume_state['params'], ema_params=resume_state['params_ema'],
            opt_state=g_opt,
            stats={'mean_path_length': jnp.asarray(resume_state['mean_path_length'])}), self.mesh)
        self.d_state = replicate(TrainState(
            step=step, params=resume_state['params_d'], ema_params=None,
            opt_state=d_opt), self.mesh)
