"""Diffusion noise schedules.

Single consolidated implementation of ``get_beta_schedule`` — the reference
carries four duplicated copies (reference models/epsnet/condensenc.py:13-43,
models/epsnet/dualenc.py:29-59, models/sampler.py:11-41,
models/epsnet/diffusion.py:37-67).  Betas are computed in float64 numpy and
cast to float32, exactly as the reference casts through
``torch.from_numpy(betas).float()`` (reference models/epsnet/condensenc.py:97);
``alphas = cumprod(1 - betas)`` likewise matches condensenc.py:100 (cumprod in
float32 to preserve bit-level behavior of the float32 torch cumprod).

Production config: sigmoid schedule, beta in [1e-7, 2e-3], T=5000
(reference configs/train_config.yml:29-32).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def get_beta_schedule(
    beta_schedule: str,
    *,
    beta_start: float,
    beta_end: float,
    num_diffusion_timesteps: int,
) -> np.ndarray:
    """Beta schedule as float64 numpy, (T,)."""

    def sigmoid(x):
        return 1.0 / (np.exp(-x) + 1.0)

    T = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(T, dtype=np.float64)
    elif beta_schedule == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(T, 1, T, dtype=np.float64)
    elif beta_schedule == "sigmoid":
        betas = np.linspace(-6, 6, T)
        betas = sigmoid(betas) * (beta_end - beta_start) + beta_start
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (T,)
    return betas


def alphas_from_betas(betas: np.ndarray) -> np.ndarray:
    """alpha_bar_t = prod_{s<=t} (1 - beta_s).

    Matches the reference bit-for-bit: betas cast to float32 first, then the
    subtraction and cumprod run in float32 (reference condensenc.py:97-100).
    """
    one_minus = np.float32(1.0) - betas.astype(np.float32)
    return np.cumprod(one_minus, dtype=np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Immutable schedule bundle; the non-trainable buffers of the reference
    model (reference models/epsnet/condensenc.py:91-102)."""

    betas: jax.Array   # (T,) float32
    alphas: jax.Array  # (T,) float32 cumulative products

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @property
    def sigmas(self) -> jax.Array:
        """sigma_t = sqrt(1 - abar_t) / sqrt(abar_t) — the scaled-frame noise
        ladder used by the sampler (reference models/sampler.py:143)."""
        return jnp.sqrt(1.0 - self.alphas) / jnp.sqrt(self.alphas)

    @classmethod
    def from_config(cls, config) -> "DiffusionSchedule":
        """Build from a model config with beta_schedule/beta_start/beta_end/
        num_diffusion_timesteps keys (reference configs/train_config.yml:29-32)."""
        betas = get_beta_schedule(
            config.beta_schedule,
            beta_start=config.beta_start,
            beta_end=config.beta_end,
            num_diffusion_timesteps=config.num_diffusion_timesteps,
        ).astype(np.float32)
        return cls(betas=jnp.asarray(betas), alphas=jnp.asarray(alphas_from_betas(betas)))
