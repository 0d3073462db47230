"""Reverse-diffusion sampling as a single jitted ``lax.scan``.

TPU-native re-design of the production sampling loop
(``EnsembleSampler.dynamic_sampling``, reference models/sampler.py:118-257)
and the GeoDiff-legacy update rules
(``langevin_dynamics_sample_diffusion``, reference models/epsnet/dualenc.py:
754-967).

Key observation: every update rule in the reference —

  * ``ld``          (reference sampler.py:238-244)
  * ``ddpm``        (scaled-frame DDPM, reference sampler.py:215-236)
  * ``ddpm_noisy``  (legacy unscaled DDPM, reference dualenc.py:928-944)
  * ``ddpm_det``    (legacy, posterior variance, reference dualenc.py:910-926)
  * ``generalized`` (legacy DDIM-with-eta + LD step clamping,
                     reference dualenc.py:871-908)

is AFFINE in (pos, eps_pos, noise):

    pos_next = A_k * pos + B_k * eps_pos + C_k * noise

with coefficients depending only on schedule scalars at step k.  We therefore
precompute (A, B, C) on the host once per (settings, schedule) and the scan
body is: score-network forward -> eq_transform -> clip_norm -> one fused
axpy -> center_pos.  No per-step branching, no host round-trips, the whole
n_steps x ensemble loop is one XLA program.

Frames: the loop runs in the reference's scaled coordinate frame
(``pos_init * sigmas[-1]`` for generation from noise); trajectories are
rescaled by sqrt(alpha) exactly as reference sampling.py:210-216.

NaN policy: the reference raises ``FloatingPointError`` mid-loop (reference
sampler.py:248-250); a jitted scan cannot raise, so we accumulate a boolean
``nan_detected`` flag that the host checks to trigger the retry-with-clip-20
path (reference sampling.py:234-236 — which had a latent bug: the reduced
clip was never actually applied; fixed in our CLI driver).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tsdiff_tpu.core.geometry import center_pos, clip_norm, eq_transform
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule

#: score_fn(pos) -> (edge_inv (B,N,N,1), emask (B,N,N), edge_length (B,N,N))
ScoreFn = Callable[[jax.Array], tuple[jax.Array, jax.Array, jax.Array]]


@dataclasses.dataclass(frozen=True)
class SamplingSettings:
    """Sampling hyperparameters (CLI flags of reference sampling.py:103-110)."""

    sampling_type: str = "ld"   # ld | ddpm | ddpm_noisy | ddpm_det | generalized
    n_steps: int = 5000
    step_lr: float = 1e-7
    clip: float = 1000.0
    clip_pos: float | None = None
    eta: float = 1.0
    denoise_from_time_t: int | None = None
    noise_from_time_t: int | None = None
    save_traj: bool = False
    #: When set to m < n_steps, walk an evenly-strided m-element SUBSEQUENCE
    #: of the n_steps window instead of every step (DDIM-style respacing:
    #: each update pairs timestep i with j = the previous subsequence element
    #: rather than i - 1, so alpha_j jumps multiple schedule entries at once).
    #: The reference's own `generalized` rule is built for exactly this kind
    #: of step skipping (reference dualenc.py:871-908); the ddpm variants
    #: respace the same way (the (at, atm1) algebra is unchanged — only which
    #: j each i pairs with).  Quality-gated in tests/test_respacing.py.
    timestep_respacing: int | None = None


class StepCoeffs(NamedTuple):
    a: np.ndarray  # (n_steps,) coefficient of pos
    b: np.ndarray  # (n_steps,) coefficient of eps_pos
    c: np.ndarray  # (n_steps,) coefficient of noise
    timesteps: np.ndarray  # (n_steps,) the i-index walked, descending
    alphas_i: np.ndarray   # (n_steps,) alphas[i_k] for trajectory rescale


class SampleResult(NamedTuple):
    pos: jax.Array          # (B, N, 3) final scaled-frame coordinates
    traj: jax.Array | None  # (n_steps, B, N, 3) scaled frame, execution order
    nan_detected: jax.Array  # () bool


def build_step_coeffs(
    schedule: DiffusionSchedule, settings: SamplingSettings
) -> StepCoeffs:
    """Per-step affine update coefficients (host-side, float64 -> float32).

    The step index walk replicates reference models/sampler.py:149-182:
    ``seq = range(t_end - n_steps, t_end)``, iterated in reverse, paired with
    ``seq_next = [-1] + seq[:-1]`` so j = i - 1 except the final step where
    j = -1 and alpha_{j} = 1 (the prepended-zero-beta trick of
    ``compute_alpha``, reference sampler.py:138-141).

    With ``settings.timestep_respacing = m < n_steps``, ``seq`` becomes an
    evenly-strided m-element subsequence of the same window (endpoints
    included), and j is the PREVIOUS SUBSEQUENCE element — the standard DDIM
    respacing construction.  All update-rule formulas below are written in
    terms of (alpha_i, alpha_j) and remain valid verbatim; only the i -> j
    pairing changes.
    """
    alphas = np.asarray(schedule.alphas, dtype=np.float64)
    T = alphas.shape[0]
    sigmas = np.sqrt(1.0 - alphas) / np.sqrt(alphas)

    t_end = settings.denoise_from_time_t if settings.denoise_from_time_t is not None else T
    n = settings.n_steps
    if not (t_end >= n):
        raise ValueError(f"denoise window [{t_end - n}, {t_end}) invalid: t_end >= n_steps required")

    m = settings.timestep_respacing
    if m is not None and not (1 <= m <= n):
        raise ValueError(f"timestep_respacing={m} must be in [1, n_steps={n}]")
    if m is None or m >= n:
        i_arr = np.arange(t_end - 1, t_end - n - 1, -1)      # descending
    else:
        # evenly-strided subsequence of [t_end - n, t_end), both window
        # endpoints kept (the final step must still land on t_end - n so the
        # physical-frame rescale factor is unchanged); descending order
        i_arr = np.unique(
            np.round(np.linspace(t_end - n, t_end - 1, m)).astype(np.int64)
        )[::-1].copy()
    # j = previous element of the walked sequence; the lowest element pairs
    # with -1 (alpha = 1), exactly as the reference's prepended seq_next
    j_arr = np.concatenate([i_arr[1:], [-1]])

    at = alphas[i_arr]
    atm1 = np.where(j_arr >= 0, alphas[np.maximum(j_arr, 0)], 1.0)
    sig_i = sigmas[i_arr]
    noise_mask = (i_arr != 0).astype(np.float64)  # no noise at t == 0
    # schedule entries consumed by each step (all 1 when contiguous; under
    # respacing the LD-family step sizes scale with the gap — the coarser
    # Euler-Maruyama discretization of the SAME annealed-Langevin SDE: drift
    # scales with the consumed step count, noise variance likewise).  The
    # final step's j is the alpha=1 sentinel (-1), NOT a schedule index, so
    # its gap is measured to one-below-the-window-floor instead (1 for a
    # contiguous walk regardless of where the window sits).
    gap = (i_arr - j_arr).astype(np.float64)
    if i_arr.size:  # n_steps=0 entry modes walk an empty sequence (no-op)
        gap[-1] = i_arr[-1] - (t_end - n - 1)

    st = settings.sampling_type
    if st == "ld":
        step = settings.step_lr * (sig_i / 0.01) ** 2 * gap
        a = np.ones_like(at)
        b = step / sig_i
        c = np.sqrt(2.0 * step)
    elif st == "ddpm":
        # Scaled-frame DDPM (reference sampler.py:215-236).  With
        # pos_C = sqrt(at) * pos, pos0_from_e simplifies to
        # pos + sqrt(1/at - 1) * eps_pos.
        beta_t = 1.0 - at / atm1
        denom = (1.0 - at) * np.sqrt(atm1)
        a = (np.sqrt(atm1) * beta_t * 1.0
             + np.sqrt(1.0 - beta_t) * (1.0 - atm1) * np.sqrt(at)) / denom
        b = np.sqrt(atm1) * beta_t * np.sqrt(1.0 / at - 1.0) / denom
        c = noise_mask * np.sqrt(beta_t) / np.sqrt(atm1)
    elif st in ("ddpm_noisy", "ddpm_det"):
        # Legacy unscaled DDPM (reference dualenc.py:910-944).
        beta_t = 1.0 - at / atm1
        denom = 1.0 - at
        a = (np.sqrt(atm1) * beta_t * np.sqrt(1.0 / at)
             + np.sqrt(1.0 - beta_t) * (1.0 - atm1)) / denom
        b = np.sqrt(atm1) * beta_t * np.sqrt(1.0 / at - 1.0) / denom
        if st == "ddpm_noisy":
            c = noise_mask * np.sqrt(beta_t)
        else:
            c = noise_mask * np.sqrt(beta_t * (1.0 - atm1) / (1.0 - at))
    elif st == "generalized":
        # Legacy DDIM-with-eta, with elementwise min against the LD step
        # sizes (reference dualenc.py:871-908).
        eta = settings.eta
        c1 = eta * np.sqrt((1.0 - at / atm1) * (1.0 - atm1) / (1.0 - at))
        c2 = np.sqrt(np.maximum((1.0 - atm1) - c1**2, 0.0))
        # the DDIM-side quantities (c1/c2/step_pos_gen) are already gap-aware
        # through atm1; only the LD-derived clamps scale with the gap
        step_pos_ld = settings.step_lr * (sig_i / 0.01) ** 2 * gap / sig_i
        step_pos_gen = 5.0 * (np.sqrt(1.0 - at) / np.sqrt(at) - c2 / np.sqrt(atm1))
        step_pos = np.minimum(step_pos_ld, step_pos_gen)
        step_noise_ld = np.sqrt(settings.step_lr * (sig_i / 0.01) ** 2 * gap * 2.0)
        step_noise_gen = 3.0 * (c1 / np.sqrt(atm1))
        step_noise = np.minimum(step_noise_ld, step_noise_gen)
        a = np.ones_like(at)
        b = step_pos
        c = step_noise
    else:
        raise NotImplementedError(f"Unknown sampling_type: {st}")

    f32 = lambda x: np.asarray(x, dtype=np.float32)
    return StepCoeffs(f32(a), f32(b), f32(c), i_arr.astype(np.int32), f32(at))


def initial_position(
    schedule: DiffusionSchedule,
    settings: SamplingSettings,
    pos_init: jax.Array,
    key: jax.Array,
) -> jax.Array:
    """Scaled-frame starting coordinates for the three entry modes
    (reference models/sampler.py:149-182):

      (a) generation from pure noise: pos_init * sigmas[-1];
      (b) denoise_from_time_t: start from a scaled TS guess as-is;
      (c) noise_from_time_t s -> t: partially re-noise the guess with
          sigma^2 = (1 - a_t/a_s) / a_t, then denoise.
    """
    alphas = np.asarray(schedule.alphas, dtype=np.float64)
    if settings.noise_from_time_t is not None:
        t, s = settings.denoise_from_time_t, settings.noise_from_time_t
        assert t is not None and t >= settings.n_steps and t >= s >= 0
        alpha_t = alphas[t - 1]
        alpha_s = alphas[s - 1] if s != 0 else 1.0
        sigma = float(np.sqrt((1.0 - alpha_t / alpha_s) / alpha_t))
        noise = jax.random.normal(key, pos_init.shape, pos_init.dtype)
        return pos_init + noise * sigma
    elif settings.denoise_from_time_t is not None:
        assert settings.denoise_from_time_t >= settings.n_steps
        return pos_init
    else:
        sigma_last = float(
            np.sqrt(1.0 - alphas[-1]) / np.sqrt(alphas[-1])
        )
        return pos_init * sigma_last


def dynamic_sampling(
    score_fn: ScoreFn,
    schedule: DiffusionSchedule,
    pos_init: jax.Array,    # (B, N, 3)
    node_mask: jax.Array,   # (B, N)
    key: jax.Array,
    settings: SamplingSettings,
) -> SampleResult:
    """Run the reverse-diffusion loop; returns scaled-frame coordinates.

    Functional analog of reference models/sampler.py:118-257.  ``score_fn``
    encapsulates the (possibly ensembled) score network; see
    tsdiff_tpu/diffusion/ensemble.py.
    """
    coeffs = build_step_coeffs(schedule, settings)
    a = jnp.asarray(coeffs.a)
    b = jnp.asarray(coeffs.b)
    c = jnp.asarray(coeffs.c)

    key_init, key_scan = jax.random.split(key)
    pos0 = initial_position(schedule, settings, pos_init, key_init)
    pos0 = pos0 * node_mask[..., None].astype(pos0.dtype)

    returns_node_eq = getattr(score_fn, "returns_node_eq", False)

    def step(carry, xs):
        pos, nan_flag, k = carry
        a_k, b_k, c_k = xs
        if returns_node_eq:
            # packed fast path: the score fn already chain-ruled to per-atom
            # vectors (tsdiff_tpu/core/packed.eq_transform_packed)
            node_eq = score_fn(pos)
        else:
            edge_inv, emask, d = score_fn(pos)
            node_eq = eq_transform(edge_inv, pos, emask, d)
        eps_pos = clip_norm(node_eq, limit=settings.clip)

        noise = jax.random.normal(
            jax.random.fold_in(key_scan, k), pos.shape, pos.dtype
        )
        pos_next = a_k * pos + b_k * eps_pos + c_k * noise

        nan_flag = nan_flag | jnp.any(jnp.isnan(pos_next))
        pos_next = center_pos(pos_next, node_mask)
        if settings.clip_pos is not None:
            pos_next = jnp.clip(pos_next, -settings.clip_pos, settings.clip_pos)
        out = pos_next if settings.save_traj else None
        return (pos_next, nan_flag, k + 1), out

    (pos, nan_flag, _), traj = jax.lax.scan(
        step,
        (pos0, jnp.asarray(False), jnp.asarray(0, jnp.int32)),
        (a, b, c),
    )
    return SampleResult(pos=pos, traj=traj, nan_detected=nan_flag)


def final_frame_scale(
    schedule: DiffusionSchedule, settings: SamplingSettings
) -> float:
    """Scaled-frame -> physical-frame factor for the FINAL positions:
    ``sqrt(alphas[t_end - n_steps])``, i.e. the last entry of the
    ``rescale_trajectory`` scale vector (reference sampling.py:210-216 always
    rescales; for a full-schedule run the factor is ~1, but for
    ``denoise_from_time_t > n_steps`` the raw scan output is NOT in physical
    coordinates and this factor is essential)."""
    coeffs = build_step_coeffs(schedule, settings)
    return float(np.sqrt(coeffs.alphas_i[-1]))


def rescale_trajectory(
    traj: jax.Array, schedule: DiffusionSchedule, settings: SamplingSettings
) -> jax.Array:
    """traj[k] * sqrt(alphas[i_k]) — convert the scaled-frame trajectory to
    physical coordinates (reference sampling.py:210-216)."""
    coeffs = build_step_coeffs(schedule, settings)
    scale = jnp.sqrt(jnp.asarray(coeffs.alphas_i))
    return traj * scale[:, None, None, None]
