"""ResShift residual-shifting diffusion engine, pure JAX
(reference: basicsr/utils/gaussian_diffusion.py:10-713).

Forward process shifts x_t toward the LQ-latent residual:
    q(x_t | x_0, y) = N(x_t; x_0 + eta_t (y - x_0), kappa^2 eta_t I)

All schedule tables are static numpy (jit constants); per-sample timestep
gathers are jnp takes; the reverse process ``p_sample_loop`` runs as a
``lax.scan`` over the (static, possibly respaced) timestep ladder with an
explicit PRNG key. NHWC.
"""

from __future__ import annotations

import enum
import math
from collections import OrderedDict
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def get_named_eta_schedule(schedule_name: str,
                           num_diffusion_timesteps: int,
                           min_noise_level: float,
                           etas_end: float = 0.99,
                           kappa: float = 1.0,
                           kwargs: Optional[dict] = None) -> np.ndarray:
    """(reference gaussian_diffusion.py:10-45)"""
    kwargs = kwargs or {}
    if schedule_name == 'exponential':
        power = kwargs.get('power', None)
        etas_start = min(min_noise_level / kappa, min_noise_level)
        increaser = math.exp(1 / (num_diffusion_timesteps - 1) * math.log(etas_end / etas_start))
        base = np.ones([num_diffusion_timesteps]) * increaser
        power_timestep = np.linspace(0, 1, num_diffusion_timesteps, endpoint=True)**power
        power_timestep *= (num_diffusion_timesteps - 1)
        sqrt_etas = np.power(base, power_timestep) * etas_start
    elif schedule_name == 'ldm':
        import scipy.io as sio
        sqrt_etas = sio.loadmat(kwargs.get('mat_path'))['sqrt_etas'].reshape(-1)
    else:
        raise ValueError(f'Unknown schedule_name {schedule_name}')
    return sqrt_etas


class ModelMeanType(enum.Enum):
    START_X = enum.auto()
    EPSILON = enum.auto()
    PREVIOUS_X = enum.auto()
    RESIDUAL = enum.auto()
    EPSILON_SCALE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    WEIGHTED_MSE = enum.auto()


def mean_flat(x):
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def _extract(arr: np.ndarray, t, ndim: int):
    """Gather schedule values per-sample and broadcast to ndim dims."""
    vals = jnp.asarray(arr, jnp.float32)[t]
    return vals.reshape(vals.shape + (1,) * (ndim - 1))


class GaussianDiffusion:
    """(reference gaussian_diffusion.py:86-625)"""

    def __init__(self, *, sqrt_etas, kappa, model_mean_type, loss_type, sf=4,
                 scale_factor=None, normalize_input=True, latent_flag=True):
        self.kappa = kappa
        self.model_mean_type = model_mean_type
        self.loss_type = loss_type
        self.scale_factor = scale_factor
        self.normalize_input = normalize_input
        self.latent_flag = latent_flag
        self.sf = sf

        self.sqrt_etas = np.asarray(sqrt_etas, np.float64)
        self.etas = self.sqrt_etas**2
        assert self.etas.ndim == 1 and (self.etas > 0).all() and (self.etas <= 1).all()
        self.num_timesteps = int(self.etas.shape[0])
        self.etas_prev = np.append(0.0, self.etas[:-1])
        self.alpha = self.etas - self.etas_prev

        self.posterior_variance = kappa**2 * self.etas_prev / self.etas * self.alpha
        self.posterior_variance_clipped = np.append(self.posterior_variance[1],
                                                    self.posterior_variance[1:])
        self.posterior_log_variance_clipped = np.log(self.posterior_variance_clipped)
        self.posterior_mean_coef1 = self.etas_prev / self.etas
        self.posterior_mean_coef2 = self.alpha / self.etas

        if model_mean_type in (ModelMeanType.START_X, ModelMeanType.RESIDUAL):
            weight_loss_mse = 0.5 / self.posterior_variance_clipped * (self.alpha / self.etas)**2
        elif model_mean_type in (ModelMeanType.EPSILON, ModelMeanType.EPSILON_SCALE):
            weight_loss_mse = 0.5 / self.posterior_variance_clipped * (
                kappa * self.alpha / ((1 - self.etas) * self.sqrt_etas))**2
        else:
            raise NotImplementedError(model_mean_type)
        self.weight_loss_mse = weight_loss_mse

    # ------------------------------------------------------------- forward q
    def q_mean_variance(self, x_start, y, t):
        mean = _extract(self.etas, t, x_start.ndim) * (y - x_start) + x_start
        variance = _extract(self.etas, t, x_start.ndim) * self.kappa**2
        return mean, variance, jnp.log(variance)

    def q_sample(self, x_start, y, t, noise):
        """(reference :169-186)"""
        assert noise.shape == x_start.shape
        return (_extract(self.etas, t, x_start.ndim) * (y - x_start) + x_start
                + _extract(self.sqrt_etas * self.kappa, t, x_start.ndim) * noise)

    def q_posterior_mean_variance(self, x_start, x_t, t):
        posterior_mean = (_extract(self.posterior_mean_coef1, t, x_t.ndim) * x_t
                          + _extract(self.posterior_mean_coef2, t, x_t.ndim) * x_start)
        posterior_variance = _extract(self.posterior_variance, t, x_t.ndim)
        posterior_log_variance = _extract(self.posterior_log_variance_clipped, t, x_t.ndim)
        return posterior_mean, posterior_variance, posterior_log_variance

    # ------------------------------------------------------------- reverse p
    def p_mean_variance(self, model, x_t, y, t, clip_denoised=True, denoised_fn=None,
                        model_kwargs=None):
        model_kwargs = model_kwargs or {}
        model_output = model(self._scale_input(x_t, t), t, **model_kwargs)
        model_variance = _extract(self.posterior_variance, t, x_t.ndim)
        model_log_variance = _extract(self.posterior_log_variance_clipped, t, x_t.ndim)

        def process_xstart(x):
            if denoised_fn is not None:
                x = denoised_fn(x)
            if clip_denoised:
                x = jnp.clip(x, -1, 1)
            return x

        if self.model_mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
        elif self.model_mean_type == ModelMeanType.RESIDUAL:
            pred_xstart = process_xstart(self._predict_xstart_from_residual(y, model_output))
        elif self.model_mean_type == ModelMeanType.EPSILON:
            pred_xstart = process_xstart(self._predict_xstart_from_eps(x_t, y, t, model_output))
        elif self.model_mean_type == ModelMeanType.EPSILON_SCALE:
            pred_xstart = process_xstart(self._predict_xstart_from_eps_scale(x_t, y, t, model_output))
        else:
            raise ValueError(f'Unknown Mean type: {self.model_mean_type}')

        model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x_t, t)
        return {'mean': model_mean, 'variance': model_variance,
                'log_variance': model_log_variance, 'pred_xstart': pred_xstart}

    def _predict_xstart_from_eps(self, x_t, y, t, eps):
        return (x_t - _extract(self.sqrt_etas, t, x_t.ndim) * self.kappa * eps
                - _extract(self.etas, t, x_t.ndim) * y) / _extract(1 - self.etas, t, x_t.ndim)

    def _predict_xstart_from_eps_scale(self, x_t, y, t, eps):
        return (x_t - eps - _extract(self.etas, t, x_t.ndim) * y) / _extract(1 - self.etas, t, x_t.ndim)

    def _predict_xstart_from_residual(self, y, residual):
        return y - residual

    def _predict_eps_from_xstart(self, x_t, y, t, pred_xstart):
        return (x_t - _extract(1 - self.etas, t, x_t.ndim) * pred_xstart
                - _extract(self.etas, t, x_t.ndim) * y) / _extract(self.kappa * self.sqrt_etas,
                                                                   t, x_t.ndim)

    def p_sample(self, key, model, x, y, t, clip_denoised=True, denoised_fn=None,
                 model_kwargs=None, noise_repeat=False):
        """(reference :316-343)"""
        out = self.p_mean_variance(model, x, y, t, clip_denoised, denoised_fn, model_kwargs)
        noise = jax.random.normal(key, x.shape, x.dtype)
        if noise_repeat:
            noise = jnp.tile(noise[:1], (x.shape[0],) + (1,) * (x.ndim - 1))
        nonzero_mask = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        sample = out['mean'] + nonzero_mask * jnp.exp(0.5 * out['log_variance']) * noise
        return {'sample': sample, 'pred_xstart': out['pred_xstart'], 'mean': out['mean']}

    def p_sample_loop(self, key, y, model, first_stage_model=None, noise=None,
                      noise_repeat=False, clip_denoised=True, denoised_fn=None,
                      model_kwargs=None):
        """Full reverse chain as a lax.scan (reference :346-450).

        ``model`` is ``model(x, t, **kwargs) -> output``; ``first_stage_model``
        an object with encode/decode (see models/resshift_model.py).
        """
        z_y = self.encode_first_stage(y, first_stage_model, up_sample=True)
        key, nkey = jax.random.split(key)
        if noise is None:
            noise = jax.random.normal(nkey, z_y.shape, z_y.dtype)
        if noise_repeat:
            noise = jnp.tile(noise[:1], (z_y.shape[0],) + (1,) * (z_y.ndim - 1))
        z_sample = self.prior_sample(z_y, noise)

        indices = np.asarray(list(range(self.num_timesteps))[::-1])

        def step(carry, idx_key):
            z, = carry
            i, k = idx_key
            t = jnp.full((z_y.shape[0],), i, jnp.int32)
            out = self.p_sample(k, model, z, z_y, t, clip_denoised, denoised_fn,
                                model_kwargs, noise_repeat)
            return (out['sample'],), None

        keys = jax.random.split(key, len(indices))
        (z_final,), _ = jax.lax.scan(step, (z_sample,), (jnp.asarray(indices), keys))
        return self.decode_first_stage(z_final, first_stage_model)

    # --------------------------------------------------- first-stage coding
    def decode_first_stage(self, z_sample, first_stage_model=None, split_channels: int = 3):
        """Channel-split decode for >3-band inputs (reference :453-495)."""
        if first_stage_model is None:
            return z_sample
        z_sample = z_sample / self.scale_factor
        c = z_sample.shape[-1]
        assert c % split_channels == 0, f'channels {c} not divisible by {split_channels}'
        chunks = jnp.split(z_sample, c // split_channels, axis=-1)
        decoded = [first_stage_model.decode(chunk) for chunk in chunks]
        return jnp.concatenate(decoded, axis=-1)

    def encode_first_stage(self, y, first_stage_model=None, up_sample=False,
                           split_channels: int = 3):
        """(reference :497-529)"""
        from ..archs.arch_util import resize_bicubic
        if up_sample and self.sf != 1:
            y = resize_bicubic(y, float(self.sf))
        if first_stage_model is None:
            return y
        c = y.shape[-1]
        assert c % split_channels == 0, f'channels {c} not divisible by {split_channels}'
        chunks = jnp.split(y, c // split_channels, axis=-1)
        encoded = [first_stage_model.encode(chunk) * self.scale_factor for chunk in chunks]
        return jnp.concatenate(encoded, axis=-1)

    def prior_sample(self, y, noise):
        """q(x_T | y) (reference :531-543)"""
        t = jnp.full((y.shape[0],), self.num_timesteps - 1, jnp.int32)
        return y + _extract(self.kappa * self.sqrt_etas, t, y.ndim) * noise

    # ------------------------------------------------------------- training
    def training_losses(self, key, model, x_start, y, t, first_stage_model=None,
                        model_kwargs=None, noise=None):
        """(reference :545-611). Returns (loss_dict, z_t, pred_zstart)."""
        model_kwargs = model_kwargs or {}
        z_y = self.encode_first_stage(y, first_stage_model, up_sample=True)
        z_start = self.encode_first_stage(x_start, first_stage_model, up_sample=False)

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

    def _scale_input(self, inputs, t):
        """(reference :613-625)"""
        if not self.normalize_input:
            return inputs
        if self.latent_flag:
            std = jnp.sqrt(_extract(self.etas, t, inputs.ndim) * self.kappa**2 + 1)
            return inputs / std
        inputs_max = _extract(self.sqrt_etas, t, inputs.ndim) * self.kappa * 3 + 1
        return inputs / inputs_max


class SpacedDiffusion(GaussianDiffusion):
    """Timestep-respaced process (reference :626-649)."""

    def __init__(self, use_timesteps, **kwargs):
        self.use_timesteps = set(use_timesteps)
        self.timestep_map = []
        self.original_num_steps = len(kwargs['sqrt_etas'])
        base = GaussianDiffusion(**kwargs)
        new_sqrt_etas = []
        for ii, v in enumerate(base.sqrt_etas):
            if ii in self.use_timesteps:
                new_sqrt_etas.append(v)
                self.timestep_map.append(ii)
        kwargs['sqrt_etas'] = np.array(new_sqrt_etas)
        super().__init__(**kwargs)


def space_timesteps(num_timesteps: int, sample_timesteps: int):
    """(reference :650-662)"""
    return set(int((num_timesteps / sample_timesteps) * x) for x in range(sample_timesteps))


def create_gaussian_diffusion(*, normalize_input, schedule_name, sf=4,
                              min_noise_level=0.01, steps=1000, kappa=1,
                              etas_end=0.99, schedule_kwargs=None, weighted_mse=False,
                              predict_type='xstart', timestep_respacing=None,
                              scale_factor=None, latent_flag=True):
    """(reference :665-713)"""
    sqrt_etas = get_named_eta_schedule(schedule_name, num_diffusion_timesteps=steps,
                                       min_noise_level=min_noise_level, etas_end=etas_end,
                                       kappa=kappa, kwargs=schedule_kwargs)
    if timestep_respacing is None:
        timestep_respacing = steps
    else:
        assert isinstance(timestep_respacing, int)
    model_mean_type = {
        'xstart': ModelMeanType.START_X,
        'epsilon': ModelMeanType.EPSILON,
        'epsilon_scale': ModelMeanType.EPSILON_SCALE,
        'residual': ModelMeanType.RESIDUAL,
    }[predict_type]
    return SpacedDiffusion(
        use_timesteps=space_timesteps(steps, timestep_respacing),
        sqrt_etas=sqrt_etas, kappa=kappa, model_mean_type=model_mean_type,
        loss_type=LossType.WEIGHTED_MSE if weighted_mse else LossType.MSE,
        scale_factor=scale_factor, normalize_input=normalize_input, sf=sf,
        latent_flag=latent_flag)
