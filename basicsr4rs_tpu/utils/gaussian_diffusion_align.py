"""Align-variant diffusion engine (reference:
basicsr/utils/gaussian_diffusion_align.py; diff vs the base engine at
:450-513): whole-tensor encode/decode (no 3-channel splitting, no
``scale_factor`` multiply) with an optional gradient path through the
first-stage model — used when the align autoencoder is trained jointly."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian_diffusion import (GaussianDiffusion, LossType, ModelMeanType,
                                 SpacedDiffusion, get_named_eta_schedule, space_timesteps)


class GaussianDiffusionAlign(GaussianDiffusion):

    def decode_first_stage(self, z_sample, first_stage_model=None, no_grad: bool = True):
        if first_stage_model is None:
            return z_sample
        out = first_stage_model.decode(z_sample)
        return jax.lax.stop_gradient(out) if no_grad else out

    def encode_first_stage(self, y, first_stage_model=None, up_sample: bool = False,
                           no_grad: bool = True):
        from ..archs.arch_util import resize_bicubic
        if up_sample and self.sf != 1:
            y = resize_bicubic(y, float(self.sf))
        if first_stage_model is None:
            return y
        out = first_stage_model.encode(y)
        return jax.lax.stop_gradient(out) if no_grad else out

    def training_losses(self, key, model, x_start, y, t, first_stage_model=None,
                        model_kwargs=None, noise=None, no_grad_encode: bool = True):
        """Same as the base but with controllable encode gradients."""
        from collections import OrderedDict
        from .gaussian_diffusion import _extract, mean_flat
        model_kwargs = model_kwargs or {}
        z_y = self.encode_first_stage(y, first_stage_model, up_sample=True,
                                      no_grad=no_grad_encode)
        z_start = self.encode_first_stage(x_start, first_stage_model, up_sample=False,
                                          no_grad=no_grad_encode)
        if noise is None:
            noise = jax.random.normal(key, z_start.shape, z_start.dtype)
        z_t = self.q_sample(z_start, z_y, t, noise)

        loss_dict = OrderedDict()
        model_output = model(self._scale_input(z_t, t), t, **model_kwargs)
        target = {
            ModelMeanType.START_X: z_start,
            ModelMeanType.RESIDUAL: z_y - z_start,
            ModelMeanType.EPSILON: noise,
            ModelMeanType.EPSILON_SCALE: noise * self.kappa * _extract(self.sqrt_etas, t, noise.ndim),
        }[self.model_mean_type]
        mse = mean_flat((target - model_output)**2)
        if self.model_mean_type == ModelMeanType.EPSILON_SCALE:
            mse = mse / (self.kappa**2 * _extract(self.etas, t, 1))
        if self.loss_type == LossType.WEIGHTED_MSE:
            mse = mse * _extract(self.weight_loss_mse, t, 1)
        loss_dict['mse'] = mse

        if self.model_mean_type == ModelMeanType.START_X:
            pred_zstart = model_output
        elif self.model_mean_type == ModelMeanType.EPSILON:
            pred_zstart = self._predict_xstart_from_eps(z_t, z_y, t, model_output)
        elif self.model_mean_type == ModelMeanType.RESIDUAL:
            pred_zstart = self._predict_xstart_from_residual(z_y, model_output)
        else:
            pred_zstart = self._predict_xstart_from_eps_scale(z_t, z_y, t, model_output)
        return loss_dict, z_t, pred_zstart


def _denoise_prediction(self, key, model, hr, lr, t, model_kwargs=None, noise=None):
    """q_sample the (already latent) hr/lr pair and predict z_0 (the joint
    model's ``forward_and_backward``, reference align_joint_diff_model.py:151)."""
    model_kwargs = model_kwargs or {}
    if noise is None:
        noise = jax.random.normal(key, hr.shape, hr.dtype)
    z_t = self.q_sample(hr, lr, t, noise)
    model_output = model(self._scale_input(z_t, t), t, **model_kwargs)
    if self.model_mean_type == ModelMeanType.START_X:
        return model_output
    if self.model_mean_type == ModelMeanType.EPSILON:
        return self._predict_xstart_from_eps(z_t, lr, t, model_output)
    if self.model_mean_type == ModelMeanType.RESIDUAL:
        return self._predict_xstart_from_residual(lr, model_output)
    return self._predict_xstart_from_eps_scale(z_t, lr, t, model_output)


GaussianDiffusionAlign.denoise_prediction = _denoise_prediction


class SpacedDiffusionAlign(GaussianDiffusionAlign):
    """Respaced align variant."""

    def __init__(self, use_timesteps, **kwargs):
        self.use_timesteps = set(use_timesteps)
        self.timestep_map = []
        self.original_num_steps = len(kwargs['sqrt_etas'])
        base = GaussianDiffusionAlign(**kwargs)
        new_sqrt_etas = []
        for ii, v in enumerate(base.sqrt_etas):
            if ii in self.use_timesteps:
                new_sqrt_etas.append(v)
                self.timestep_map.append(ii)
        kwargs['sqrt_etas'] = np.array(new_sqrt_etas)
        super().__init__(**kwargs)


def create_gaussian_diffusion_align(*, normalize_input, schedule_name, sf=4,
                                    min_noise_level=0.01, steps=1000, kappa=1,
                                    etas_end=0.99, schedule_kwargs=None, weighted_mse=False,
                                    predict_type='xstart', timestep_respacing=None,
                                    latent_flag=True):
    sqrt_etas = get_named_eta_schedule(schedule_name, num_diffusion_timesteps=steps,
                                       min_noise_level=min_noise_level, etas_end=etas_end,
                                       kappa=kappa, kwargs=schedule_kwargs)
    if timestep_respacing is None:
        timestep_respacing = steps
    model_mean_type = {
        'xstart': ModelMeanType.START_X,
        'epsilon': ModelMeanType.EPSILON,
        'epsilon_scale': ModelMeanType.EPSILON_SCALE,
        'residual': ModelMeanType.RESIDUAL,
    }[predict_type]
    return SpacedDiffusionAlign(
        use_timesteps=space_timesteps(steps, timestep_respacing),
        sqrt_etas=sqrt_etas, kappa=kappa, model_mean_type=model_mean_type,
        loss_type=LossType.WEIGHTED_MSE if weighted_mse else LossType.MSE,
        scale_factor=None, normalize_input=normalize_input, sf=sf,
        latent_flag=latent_flag)
