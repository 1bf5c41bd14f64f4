"""Degradation synthesis: blur-kernel generation (host, numpy) and batched
noise injection (device, JAX).

Reference: basicsr/data/degradations.py (764 LoC). Kernel synthesis runs
host-side per batch item exactly like the reference dataset does; the noise
ops are the TPU equivalents of the reference ``*_pt`` variants and run
inside the jitted Real-ESRGAN pipeline with explicit PRNG keys.

TPU-native deviations: the Poisson ``vals`` term (2^ceil(log2(#unique
levels))) is data-dependent in the reference (a host sync per batch); here
it is computed in-graph with a 256-bin histogram — exact for the rounded
8-bit-level inputs both versions operate on. Poisson sampling itself uses a
branch-free inverse-CDF / rounded-normal hybrid (``_poisson_tpu``) instead
of rejection sampling, which on TPU costs more than the whole rest of the
synthesis program.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from scipy import special

# --------------------------------------------------------------------------
# Host-side blur kernel synthesis (numpy)
# --------------------------------------------------------------------------


def sigma_matrix2(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    """2x2 covariance from axis sigmas + rotation (reference degradations.py:20)."""
    d = np.array([[sig_x**2, 0], [0, sig_y**2]])
    u = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    return u @ d @ u.T


def mesh_grid(kernel_size: int):
    """Coordinate grid centered at 0 (reference degradations.py:39)."""
    ax = np.arange(-kernel_size // 2 + 1., kernel_size // 2 + 1.)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.hstack((xx.reshape(kernel_size * kernel_size, 1),
                    yy.reshape(kernel_size * kernel_size, 1))).reshape(kernel_size, kernel_size, 2)
    return xy, xx, yy


def pdf2(sigma_matrix: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Unnormalized bivariate Gaussian pdf on the grid (reference :58)."""
    inverse_sigma = np.linalg.inv(sigma_matrix)
    return np.exp(-0.5 * np.sum(np.dot(grid, inverse_sigma) * grid, 2))


def bivariate_Gaussian(kernel_size: int, sig_x: float, sig_y: float, theta: float,
                       grid=None, isotropic: bool = True) -> np.ndarray:
    """(reference degradations.py:84)"""
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    kernel = pdf2(sigma_matrix, grid)
    return kernel / np.sum(kernel)


def bivariate_generalized_Gaussian(kernel_size: int, sig_x: float, sig_y: float, theta: float,
                                   beta: float, grid=None, isotropic: bool = True) -> np.ndarray:
    """exp(-0.5 (x^T S^-1 x)^beta) (reference degradations.py:112)."""
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.exp(-0.5 * np.power(np.sum(np.dot(grid, inverse_sigma) * grid, 2), beta))
    return kernel / np.sum(kernel)


def bivariate_plateau(kernel_size: int, sig_x: float, sig_y: float, theta: float,
                      beta: float, grid=None, isotropic: bool = True) -> np.ndarray:
    """1 / (1 + (x^T S^-1 x)^beta) (reference degradations.py:143)."""
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.reciprocal(np.power(np.sum(np.dot(grid, inverse_sigma) * grid, 2), beta) + 1)
    return kernel / np.sum(kernel)


def _sample_sigmas(sigma_x_range, sigma_y_range, rotation_range, isotropic, rng):
    sigma_x = rng.uniform(sigma_x_range[0], sigma_x_range[1])
    if isotropic:
        return sigma_x, sigma_x, 0.
    sigma_y = rng.uniform(sigma_y_range[0], sigma_y_range[1])
    rotation = rng.uniform(rotation_range[0], rotation_range[1])
    return sigma_x, sigma_y, rotation


def random_bivariate_Gaussian(kernel_size, sigma_x_range, sigma_y_range, rotation_range,
                              noise_range=None, isotropic=True,
                              rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """(reference degradations.py:172)"""
    rng = rng or np.random
    sx, sy, rot = _sample_sigmas(sigma_x_range, sigma_y_range, rotation_range, isotropic, rng)
    kernel = bivariate_Gaussian(kernel_size, sx, sy, rot, isotropic=isotropic)
    if noise_range is not None:
        kernel = kernel * rng.uniform(noise_range[0], noise_range[1], size=kernel.shape)
    return kernel / np.sum(kernel)


def random_bivariate_generalized_Gaussian(kernel_size, sigma_x_range, sigma_y_range,
                                          rotation_range, beta_range, noise_range=None,
                                          isotropic=True, rng=None) -> np.ndarray:
    """(reference degradations.py:220); beta sampled below/above 1 like the
    reference (avoid the degenerate beta=1 Gaussian)."""
    rng = rng or np.random
    sx, sy, rot = _sample_sigmas(sigma_x_range, sigma_y_range, rotation_range, isotropic, rng)
    if rng.uniform() < 0.5:
        beta = rng.uniform(beta_range[0], 1)
    else:
        beta = rng.uniform(1, beta_range[1])
    kernel = bivariate_generalized_Gaussian(kernel_size, sx, sy, rot, beta, isotropic=isotropic)
    if noise_range is not None:
        kernel = kernel * rng.uniform(noise_range[0], noise_range[1], size=kernel.shape)
    return kernel / np.sum(kernel)


def random_bivariate_plateau(kernel_size, sigma_x_range, sigma_y_range, rotation_range,
                             beta_range, noise_range=None, isotropic=True, rng=None) -> np.ndarray:
    """(reference degradations.py:272)"""
    rng = rng or np.random
    sx, sy, rot = _sample_sigmas(sigma_x_range, sigma_y_range, rotation_range, isotropic, rng)
    if rng.uniform() < 0.5:
        beta = rng.uniform(beta_range[0], 1)
    else:
        beta = rng.uniform(1, beta_range[1])
    kernel = bivariate_plateau(kernel_size, sx, sy, rot, beta, isotropic=isotropic)
    if noise_range is not None:
        kernel = kernel * rng.uniform(noise_range[0], noise_range[1], size=kernel.shape)
    return kernel / np.sum(kernel)


def random_mixed_kernels(kernel_list: Sequence[str],
                         kernel_prob: Sequence[float],
                         kernel_size: int = 21,
                         sigma_x_range=(0.6, 5),
                         sigma_y_range=(0.6, 5),
                         rotation_range=(-np.pi, np.pi),
                         betag_range=(0.5, 8),
                         betap_range=(0.5, 8),
                         noise_range=None,
                         rng=None) -> np.ndarray:
    """Sample one kernel from the 7-type mixture (reference degradations.py:324)."""
    rng = rng or np.random
    kernel_type = rng.choice(kernel_list, p=kernel_prob) if hasattr(rng, 'choice') else np.random.choice(
        kernel_list, p=kernel_prob)
    if kernel_type == 'iso':
        kernel = random_bivariate_Gaussian(kernel_size, sigma_x_range, sigma_y_range,
                                           rotation_range, noise_range, isotropic=True, rng=rng)
    elif kernel_type == 'aniso':
        kernel = random_bivariate_Gaussian(kernel_size, sigma_x_range, sigma_y_range,
                                           rotation_range, noise_range, isotropic=False, rng=rng)
    elif kernel_type == 'generalized_iso':
        kernel = random_bivariate_generalized_Gaussian(kernel_size, sigma_x_range, sigma_y_range,
                                                       rotation_range, betag_range, noise_range,
                                                       isotropic=True, rng=rng)
    elif kernel_type == 'generalized_aniso':
        kernel = random_bivariate_generalized_Gaussian(kernel_size, sigma_x_range, sigma_y_range,
                                                       rotation_range, betag_range, noise_range,
                                                       isotropic=False, rng=rng)
    elif kernel_type == 'plateau_iso':
        kernel = random_bivariate_plateau(kernel_size, sigma_x_range, sigma_y_range,
                                          rotation_range, betap_range, None, isotropic=True, rng=rng)
    elif kernel_type == 'plateau_aniso':
        kernel = random_bivariate_plateau(kernel_size, sigma_x_range, sigma_y_range,
                                          rotation_range, betap_range, None, isotropic=False, rng=rng)
    else:
        raise ValueError(f'Unknown kernel type {kernel_type}')
    return kernel


def circular_lowpass_kernel(cutoff: float, kernel_size: int, pad_to: int = 0) -> np.ndarray:
    """2D sinc low-pass filter (reference degradations.py:389-409)."""
    assert kernel_size % 2 == 1, 'Kernel size must be an odd number.'
    with np.errstate(divide='ignore', invalid='ignore'):
        kernel = np.fromfunction(
            lambda x, y: cutoff * special.j1(cutoff * np.sqrt(
                (x - (kernel_size - 1) / 2)**2 + (y - (kernel_size - 1) / 2)**2)) / (2 * np.pi * np.sqrt(
                    (x - (kernel_size - 1) / 2)**2 + (y - (kernel_size - 1) / 2)**2)),
            [kernel_size, kernel_size])
    kernel[(kernel_size - 1) // 2, (kernel_size - 1) // 2] = cutoff**2 / (4 * np.pi)
    kernel = kernel / np.sum(kernel)
    if pad_to > kernel_size:
        pad_size = (pad_to - kernel_size) // 2
        kernel = np.pad(kernel, ((pad_size, pad_size), (pad_size, pad_size)))
    return kernel


# --------------------------------------------------------------------------
# Device-side noise (JAX) — batched NHWC, explicit keys.
# Reference `_pt` variants at degradations.py:460-731.
# --------------------------------------------------------------------------

def _clip_round(out, clip: bool, rounds: bool):
    import jax.numpy as jnp
    if clip and rounds:
        return jnp.clip((out * 255.0).round(), 0, 255) / 255.
    if clip:
        return jnp.clip(out, 0, 1)
    if rounds:
        return (out * 255.0).round() / 255.
    return out


def generate_gaussian_noise_jax(key, img, sigma, gray_noise):
    """sigma in 255-range units; sigma/gray_noise per-sample (N,) arrays."""
    import jax
    import jax.numpy as jnp
    n, h, w, c = img.shape
    key_color, key_gray = jax.random.split(key)
    sigma = jnp.reshape(sigma, (n, 1, 1, 1))
    gray = jnp.reshape(gray_noise, (n, 1, 1, 1))
    noise = jax.random.normal(key_color, img.shape, img.dtype) * sigma / 255.
    noise_gray = jax.random.normal(key_gray, (n, h, w, 1), img.dtype) * sigma / 255.
    return noise * (1 - gray) + noise_gray * gray


def random_add_gaussian_noise_jax(key, img, sigma_range=(0, 1.0), gray_prob=0.,
                                  clip=True, rounds=False):
    """(reference random_add_gaussian_noise_pt, degradations.py:544)"""
    import jax
    import jax.numpy as jnp
    n = img.shape[0]
    key_s, key_g, key_n = jax.random.split(key, 3)
    sigma = jax.random.uniform(key_s, (n,), img.dtype, sigma_range[0], sigma_range[1])
    gray = (jax.random.uniform(key_g, (n,), img.dtype) < gray_prob).astype(img.dtype)
    noise = generate_gaussian_noise_jax(key_n, img, sigma, gray)
    return _clip_round(img + noise, clip, rounds)


def _poisson_vals(img):
    """2^ceil(log2(#unique-255-levels)) per sample, in-graph (exact for
    rounded 8-bit-level input). Presence of each level is a broadcast
    compare fused into the pixel reduction — a scatter-add histogram here
    is near-serial on TPU (the dominant cost of the whole noise op)."""
    import jax
    import jax.numpy as jnp
    n = img.shape[0]
    levels = jnp.round(img * 255.0).astype(jnp.int32).reshape(n, -1)
    # pack the 256 levels into 8 int32 bitmask words per pixel and OR-reduce
    # over pixels: 32x less intermediate data than a 256-wide presence
    # compare (measured 6.7 ms -> ~1 ms at canvas size on v5e)
    word = levels >> 5                                  # (n, P) in 0..7
    bit = jnp.left_shift(jnp.int32(1), levels & 31)     # (n, P) bit pattern
    js = jnp.arange(8, dtype=jnp.int32)
    words = jnp.where(word[:, :, None] == js, bit[:, :, None], 0)  # (n, P, 8)
    mask = jax.lax.reduce(words, np.int32(0), jax.lax.bitwise_or, (1,))
    uniq = jnp.sum(jax.lax.population_count(mask), axis=1).astype(jnp.float32)
    return 2.0 ** jnp.ceil(jnp.log2(uniq))


_POISSON_SWITCH = 12.0   # lam threshold: CDF inversion below, normal above
_POISSON_KMAX = 32       # inversion truncation: P(X>31 | lam=12) ~ 4e-6


def _poisson_tpu(key, lam):
    """Branch-free Poisson sampler (TPU-native; no rejection loops).

    ``jax.random.poisson`` lowers to rejection sampling inside
    ``lax.while_loop`` — measured 105.9 ms per call at the Real-ESRGAN
    canvas size on v5e, more than the entire rest of the synthesis program
    combined (scripts/profile_degradation.py). This hybrid replaces it with
    two purely elementwise formulations selected per element:

    - lam < 12: exact inverse-CDF via the unrolled recurrence
      pmf_{k+1} = pmf_k * lam/(k+1), X = #{k < 32 : u > CDF(k)}. XLA fuses
      the unroll into one elementwise pass over the canvas.
    - lam >= 12: rounded-normal approximation max(0, round(lam + sqrt(lam) z))
      — exact mean/variance, skewness error O(lam^-1/2) <= 0.29.

    Cost is ~one normal draw (+ fused arithmetic): ~70x faster than the
    rejection sampler at synthesis shapes.
    """
    import jax
    import jax.numpy as jnp
    u_key, z_key = jax.random.split(key)
    lam = lam.astype(jnp.float32)
    u = jax.random.uniform(u_key, lam.shape, jnp.float32)
    z = jax.random.normal(z_key, lam.shape, jnp.float32)
    small = jnp.minimum(lam, _POISSON_SWITCH)  # keep exp(-lam) conditioned
    pmf = jnp.exp(-small)
    cdf = pmf
    count = jnp.zeros_like(lam)
    for k in range(1, _POISSON_KMAX):
        count = count + (u > cdf).astype(jnp.float32)
        pmf = pmf * (small / k)
        cdf = cdf + pmf
    count = count + (u > cdf).astype(jnp.float32)
    normal = jnp.maximum(jnp.round(lam + jnp.sqrt(lam) * z), 0.0)
    return jnp.where(lam < _POISSON_SWITCH, count, normal)


def generate_poisson_noise_jax(key, img, scale, gray_noise):
    import jax
    import jax.numpy as jnp
    n, h, w, c = img.shape
    key_color, key_gray = jax.random.split(key)
    gray = jnp.reshape(gray_noise, (n, 1, 1, 1))
    scale = jnp.reshape(scale, (n, 1, 1, 1))

    img_r = jnp.clip((img * 255.0).round(), 0, 255) / 255.
    vals = _poisson_vals(img_r).reshape(n, 1, 1, 1)
    out = _poisson_tpu(key_color, img_r * vals).astype(img.dtype) / vals
    noise = out - img_r

    # gray branch: luminance image (torchvision coefficients)
    coef = jnp.asarray([0.2989, 0.587, 0.114], img.dtype)
    img_gray = jnp.clip((jnp.sum(img * coef, axis=-1, keepdims=True) * 255.0).round(), 0, 255) / 255.
    vals_g = _poisson_vals(img_gray).reshape(n, 1, 1, 1)
    out_g = _poisson_tpu(key_gray, img_gray * vals_g).astype(img.dtype) / vals_g
    noise_gray = jnp.broadcast_to(out_g - img_gray, img.shape)

    noise = noise * (1 - gray) + noise_gray * gray
    return noise * scale


def random_add_poisson_noise_jax(key, img, scale_range=(0, 1.0), gray_prob=0.,
                                 clip=True, rounds=False):
    """(reference random_add_poisson_noise_pt, degradations.py:714)"""
    import jax
    import jax.numpy as jnp
    n = img.shape[0]
    key_s, key_g, key_n = jax.random.split(key, 3)
    scale = jax.random.uniform(key_s, (n,), img.dtype, scale_range[0], scale_range[1])
    gray = (jax.random.uniform(key_g, (n,), img.dtype) < gray_prob).astype(img.dtype)
    noise = generate_poisson_noise_jax(key_n, img, scale, gray)
    return _clip_round(img + noise, clip, rounds)


# re-export host-side helpers the datasets use
import jax  # noqa: E402  (used inside device fns)

from ..utils.diffjpeg import add_jpg_compression  # noqa: E402,F401


def random_add_jpg_compression(img: np.ndarray, quality_range=(90, 100), rng=None) -> np.ndarray:
    """(reference degradations.py:750)"""
    rng = rng or np.random
    quality = rng.uniform(quality_range[0], quality_range[1])
    return add_jpg_compression(img, quality)
