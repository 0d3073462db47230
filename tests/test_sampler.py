"""Sampler: affine-coefficient algebra vs literal reference formulas + end-to-end scan."""

import numpy as np
import jax
import jax.numpy as jnp

from tsdiff_tpu.config import Config
from tsdiff_tpu.diffusion.ensemble import make_ensemble_score_fn, make_score_fn, stack_params
from tsdiff_tpu.diffusion.sampler import (
    SamplingSettings,
    build_step_coeffs,
    dynamic_sampling,
    initial_position,
    rescale_trajectory,
)
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
from tsdiff_tpu.models import get_model

from test_condensenc import MODEL_CFG, make_batch

SCHEDULE = DiffusionSchedule.from_config(MODEL_CFG)  # T=100


def _literal_update(st, alphas, i, j, pos, eps_pos, noise, step_lr=1e-7, eta=1.0):
    """Literal (non-affine) re-derivation of the reference update formulas."""
    alphas = np.asarray(alphas, dtype=np.float64)
    sigmas = np.sqrt(1 - alphas) / np.sqrt(alphas)
    at = alphas[i]
    atm1 = alphas[j] if j >= 0 else 1.0
    if st == "ld":
        step = step_lr * (sigmas[i] / 0.01) ** 2
        return pos + step * eps_pos / sigmas[i] + noise * np.sqrt(2 * step)
    if st == "ddpm":
        beta_t = 1 - at / atm1
        e = -eps_pos
        pos_C = np.sqrt(at) * pos
        pos0 = np.sqrt(1 / at) * pos_C - np.sqrt(1 / at - 1) * e
        mean = (np.sqrt(atm1) * beta_t * pos0 + np.sqrt(1 - beta_t) * (1 - atm1) * pos_C) / (1 - at)
        mask = 0.0 if i == 0 else 1.0
        return (mean + mask * np.exp(0.5 * np.log(beta_t)) * noise) / np.sqrt(atm1)
    if st in ("ddpm_noisy", "ddpm_det"):
        beta_t = 1 - at / atm1
        e = -eps_pos
        pos0 = np.sqrt(1 / at) * pos - np.sqrt(1 / at - 1) * e
        mean = (np.sqrt(atm1) * beta_t * pos0 + np.sqrt(1 - beta_t) * (1 - atm1) * pos) / (1 - at)
        mask = 0.0 if i == 0 else 1.0
        if st == "ddpm_noisy":
            logvar = np.log(beta_t)
        else:
            logvar = np.log(beta_t * (1 - atm1) / (1 - at))
        return mean + mask * np.exp(0.5 * logvar) * noise
    if st == "generalized":
        c1 = eta * np.sqrt((1 - at / atm1) * (1 - atm1) / (1 - at))
        c2 = np.sqrt((1 - atm1) - c1**2)
        sp_ld = step_lr * (sigmas[i] / 0.01) ** 2 / sigmas[i]
        sp_gen = 5 * (np.sqrt(1 - at) / np.sqrt(at) - c2 / np.sqrt(atm1))
        sp = min(sp_ld, sp_gen)
        sn_ld = np.sqrt(step_lr * (sigmas[i] / 0.01) ** 2 * 2)
        sn_gen = 3 * (c1 / np.sqrt(atm1))
        sn = min(sn_ld, sn_gen)
        et = -eps_pos
        return pos - et * sp + noise * sn
    raise ValueError(st)


def test_affine_coeffs_match_literal_formulas():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(4, 3))
    eps = rng.normal(size=(4, 3))
    noise = rng.normal(size=(4, 3))
    alphas = np.asarray(SCHEDULE.alphas)

    for st in ("ld", "ddpm", "ddpm_noisy", "ddpm_det", "generalized"):
        settings = SamplingSettings(sampling_type=st, n_steps=20, step_lr=1e-7, eta=1.0)
        coeffs = build_step_coeffs(SCHEDULE, settings)
        for k in (0, 5, 19):
            i, j = int(coeffs.timesteps[k]), int(coeffs.timesteps[k]) - 1
            if k == 19:
                j = -1
            want = _literal_update(st, alphas, i, j, pos, eps, noise)
            got = coeffs.a[k] * pos + coeffs.b[k] * eps + coeffs.c[k] * noise
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7, err_msg=f"{st} k={k}")


def test_coeffs_full_schedule_noise_mask_at_zero():
    settings = SamplingSettings(sampling_type="ddpm", n_steps=SCHEDULE.num_timesteps)
    coeffs = build_step_coeffs(SCHEDULE, settings)
    assert coeffs.timesteps[0] == SCHEDULE.num_timesteps - 1
    assert coeffs.timesteps[-1] == 0
    assert coeffs.c[-1] == 0.0  # no noise at t == 0


def test_initial_position_modes():
    key = jax.random.key(0)
    pos = jnp.ones((2, 4, 3))
    # mode a
    s = SamplingSettings(n_steps=10)
    out = initial_position(SCHEDULE, s, pos, key)
    alphas = np.asarray(SCHEDULE.alphas, dtype=np.float64)
    sig_last = np.sqrt(1 - alphas[-1]) / np.sqrt(alphas[-1])
    np.testing.assert_allclose(np.asarray(out), sig_last, rtol=1e-5)
    # mode b
    s = SamplingSettings(n_steps=10, denoise_from_time_t=50)
    np.testing.assert_allclose(np.asarray(initial_position(SCHEDULE, s, pos, key)), 1.0)
    # mode c: variance matches sigma^2 = (1 - a_t/a_s)/a_t
    s = SamplingSettings(n_steps=10, denoise_from_time_t=50, noise_from_time_t=10)
    out = np.asarray(initial_position(SCHEDULE, s, jnp.zeros((1, 4000, 3)), key))
    sigma = np.sqrt((1 - alphas[49] / alphas[9]) / alphas[49])
    np.testing.assert_allclose(out.std(), sigma, rtol=0.05)


def test_end_to_end_sampling_single_and_ensemble():
    rng = np.random.default_rng(1)
    batch = make_batch(rng, [5, 8], n_pad=8)
    model = get_model(MODEL_CFG)
    init_args = (
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    params_list = [model.init(jax.random.key(s), *init_args) for s in range(3)]

    settings = SamplingSettings(sampling_type="ld", n_steps=8, save_traj=True)
    key = jax.random.key(7)
    pos_init = jax.random.normal(jax.random.key(3), batch.pos.shape)

    # single model
    res1 = jax.jit(
        lambda p, k: dynamic_sampling(
            make_score_fn(model, p, batch), SCHEDULE, pos_init, batch.node_mask, k, settings
        )
    )(params_list[0], key)
    assert res1.pos.shape == batch.pos.shape
    assert res1.traj.shape == (8, *batch.pos.shape)
    assert not bool(res1.nan_detected)
    assert np.isfinite(np.asarray(res1.pos)).all()
    # padded rows stay zero
    assert np.all(np.asarray(res1.pos)[0, 5:] == 0.0)
    # center of mass is zero per graph
    com = np.asarray(res1.pos)[0, :5].mean(axis=0)
    np.testing.assert_allclose(com, 0.0, atol=1e-5)

    # ensemble of 3
    stacked = stack_params(params_list)
    res3 = jax.jit(
        lambda sp, k: dynamic_sampling(
            make_ensemble_score_fn(model, sp, batch), SCHEDULE, pos_init, batch.node_mask, k, settings
        )
    )(stacked, key)
    assert np.isfinite(np.asarray(res3.pos)).all()
    # ensemble result differs from single-model result
    assert not np.allclose(np.asarray(res3.pos), np.asarray(res1.pos))

    # trajectory rescale shape
    traj_phys = rescale_trajectory(res1.traj, SCHEDULE, settings)
    assert traj_phys.shape == res1.traj.shape


def test_ddpm_sampling_runs():
    rng = np.random.default_rng(2)
    batch = make_batch(rng, [6], n_pad=8)
    model = get_model(MODEL_CFG)
    params = model.init(
        jax.random.key(0),
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    settings = SamplingSettings(sampling_type="ddpm", n_steps=5)
    res = dynamic_sampling(
        make_score_fn(model, params, batch),
        SCHEDULE,
        jax.random.normal(jax.random.key(1), batch.pos.shape),
        batch.node_mask,
        jax.random.key(2),
        settings,
    )
    assert np.isfinite(np.asarray(res.pos)).all()
    assert res.traj is None


def test_rescale_trajectory_factors():
    """traj[k] is scaled by sqrt(alphas[i_k]) (reference sampling.py:210-216)."""
    settings = SamplingSettings(sampling_type="ld", n_steps=7)
    coeffs = build_step_coeffs(SCHEDULE, settings)
    traj = jnp.ones((7, 2, 3, 3))
    out = np.asarray(rescale_trajectory(traj, SCHEDULE, settings))
    alphas = np.asarray(SCHEDULE.alphas)
    for k in range(7):
        np.testing.assert_allclose(
            out[k], np.sqrt(alphas[coeffs.timesteps[k]]), rtol=1e-6
        )
