"""Round-2 correctness fixes: fused_score autodiff guard, partial-denoise
output frame, legacy dual-sampler entry modes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsdiff_tpu.diffusion.objective import diffusion_loss
from tsdiff_tpu.diffusion.sampler import (
    SamplingSettings,
    build_step_coeffs,
    dynamic_sampling,
    final_frame_scale,
    initial_position,
    rescale_trajectory,
)
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
from tsdiff_tpu.models import get_model
from tsdiff_tpu.models.condensenc import _inference_only

from test_condensenc import MODEL_CFG, make_batch


@pytest.mark.heavy
def test_fused_score_training_takes_xla_path():
    """A sampling config with fused_score=True must TRAIN identically to the
    XLA-path model instead of failing at pallas trace time (VERDICT weak #3)."""
    rng = np.random.default_rng(0)
    batch = make_batch(rng, [5, 6])
    schedule = DiffusionSchedule.from_config(MODEL_CFG)

    plain = get_model(MODEL_CFG)
    fused = plain.clone(fused_score=True)
    params = plain.init(
        jax.random.key(0),
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )

    def loss_fn(model):
        def f(p):
            return diffusion_loss(model, p, schedule, batch, jax.random.key(1))[0]
        return f

    g_plain = jax.grad(loss_fn(plain))(params)
    g_fused = jax.grad(loss_fn(fused))(params)  # must not touch the kernel
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_plain),
        jax.tree_util.tree_leaves_with_path(g_fused),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=str(ka))


def test_inference_only_guard_raises_actionable_error():
    x = jnp.ones((3,))
    np.testing.assert_array_equal(_inference_only(x), x)  # identity forward
    with pytest.raises(NotImplementedError, match="fused_score"):
        jax.grad(lambda v: jnp.sum(_inference_only(v)))(x)


def test_final_frame_scale_matches_trajectory_rescale():
    """Final positions x final_frame_scale == last rescaled-trajectory frame,
    for both a full run and a partial denoise_from_time_t > n_steps run
    (reference sampling.py:210-216 always rescales; VERDICT weak #5)."""
    schedule = DiffusionSchedule.from_config(MODEL_CFG)
    T = schedule.num_timesteps

    for settings in (
        SamplingSettings(sampling_type="ld", n_steps=T),
        SamplingSettings(sampling_type="ld", n_steps=10, denoise_from_time_t=60),
        SamplingSettings(sampling_type="ddpm", n_steps=20, denoise_from_time_t=80),
    ):
        coeffs = build_step_coeffs(schedule, settings)
        t_end = settings.denoise_from_time_t or T
        expected = float(np.sqrt(np.asarray(schedule.alphas)[t_end - settings.n_steps]))
        got = final_frame_scale(schedule, settings)
        assert got == pytest.approx(expected, rel=1e-6), settings
        # identity with the trajectory path: scale vector's final entry
        fake_traj = jnp.ones((settings.n_steps, 1, 1, 1))
        resc = rescale_trajectory(fake_traj, schedule, settings)
        assert float(resc[-1, 0, 0, 0]) == pytest.approx(got, rel=1e-6)
        # partial denoise ends far from alpha ~ 1: the factor must be far from 1
        if settings.denoise_from_time_t is not None and t_end - settings.n_steps > T // 4:
            assert got < 0.999


def test_sampler_final_pos_equals_last_traj_frame():
    """End-to-end: raw scan output x final_frame_scale == rescaled traj[-1]."""
    rng = np.random.default_rng(0)
    batch = make_batch(rng, [5, 6])
    schedule = DiffusionSchedule.from_config(MODEL_CFG)
    model = get_model(MODEL_CFG)
    params = model.init(
        jax.random.key(0),
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    from tsdiff_tpu.diffusion.ensemble import make_score_fn

    settings = SamplingSettings(
        sampling_type="ld", n_steps=5, denoise_from_time_t=50, save_traj=True
    )
    res = dynamic_sampling(
        make_score_fn(model, params, batch),
        schedule,
        jnp.asarray(batch.pos),
        batch.node_mask,
        jax.random.key(3),
        settings,
    )
    traj_phys = rescale_trajectory(res.traj, schedule, settings)
    pos_phys = np.asarray(res.pos) * final_frame_scale(schedule, settings)
    np.testing.assert_allclose(np.asarray(traj_phys[-1]), pos_phys, rtol=1e-5, atol=1e-6)


def test_dual_sampler_entry_modes():
    """dual_dynamic_sampling honors all three entry modes via the shared
    ``initial_position`` (VERDICT missing #4; reference dualenc.py:754-850).
    n_steps=0 makes the scan a no-op so the returned pos IS the entry point."""
    from tsdiff_tpu.diffusion.dual_objective import dual_dynamic_sampling

    schedule = DiffusionSchedule.from_config(MODEL_CFG)
    pos_init = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 3)), jnp.float32)
    node_mask = jnp.ones((2, 5), bool)
    key = jax.random.key(7)
    key_init, _ = jax.random.split(key)

    def eps_fn(pos, gate, time_step=None):  # traced but never executed (length-0 scan)
        return jnp.zeros_like(pos)

    for settings in (
        SamplingSettings(sampling_type="ld", n_steps=0),
        SamplingSettings(sampling_type="ld", n_steps=0, denoise_from_time_t=50),
        SamplingSettings(
            sampling_type="ld", n_steps=0, denoise_from_time_t=50, noise_from_time_t=20
        ),
    ):
        pos, _, _ = dual_dynamic_sampling(
            eps_fn, schedule, pos_init, node_mask, key, settings
        )
        expected = initial_position(schedule, settings, pos_init, key_init)
        np.testing.assert_allclose(
            np.asarray(pos), np.asarray(expected), rtol=1e-6, atol=1e-7,
            err_msg=str(settings),
        )
