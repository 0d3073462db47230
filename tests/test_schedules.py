"""Beta/alpha schedules: shapes, ranges, and production-config values."""

import numpy as np

from tsdiff_tpu.config import Config
from tsdiff_tpu.diffusion.schedules import (
    DiffusionSchedule,
    alphas_from_betas,
    get_beta_schedule,
)


def test_all_schedules_shapes():
    for name in ("quad", "linear", "const", "jsd", "sigmoid"):
        b = get_beta_schedule(name, beta_start=1e-7, beta_end=2e-3, num_diffusion_timesteps=100)
        assert b.shape == (100,)
        assert (b > 0).all() and (b <= 1).all()  # jsd ends exactly at 1


def test_sigmoid_production_schedule():
    """Production: sigmoid, [1e-7, 2e-3], T=5000 (reference train_config.yml:29-32)."""
    b = get_beta_schedule("sigmoid", beta_start=1e-7, beta_end=2e-3, num_diffusion_timesteps=5000)
    # endpoints: sigmoid(-6)*(be-bs)+bs and sigmoid(6)*(be-bs)+bs
    s = lambda x: 1.0 / (np.exp(-x) + 1.0)
    np.testing.assert_allclose(b[0], s(-6) * (2e-3 - 1e-7) + 1e-7, rtol=1e-12)
    np.testing.assert_allclose(b[-1], s(6) * (2e-3 - 1e-7) + 1e-7, rtol=1e-12)
    a = alphas_from_betas(b)
    assert a.dtype == np.float32
    assert a[0] > a[-1] > 0
    # monotonically decreasing
    assert (np.diff(a) <= 0).all()


def test_schedule_from_config():
    cfg = Config(
        beta_schedule="sigmoid",
        beta_start=1e-7,
        beta_end=2e-3,
        num_diffusion_timesteps=50,
    )
    sch = DiffusionSchedule.from_config(cfg)
    assert sch.num_timesteps == 50
    sig = np.asarray(sch.sigmas)
    assert (np.diff(sig) > 0).all()  # noise grows with t


def test_jsd_schedule():
    b = get_beta_schedule("jsd", beta_start=0, beta_end=0, num_diffusion_timesteps=10)
    np.testing.assert_allclose(b, 1.0 / np.linspace(10, 1, 10))
