"""DSM sigma-ladder respacing (dual_objective.dsm_annealed_sampling).

The DSM analog of the diffusion family's timestep respacing: walk an
evenly-strided m-level subsequence of the sigma ladder.  Pins the contract:
endpoints kept (terminal noise scale unchanged), m = full ladder is
bit-identical to no respacing, cost scales with m, level selection returns
ORIGINAL ladder indices (the model's trained sigma embedding).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsdiff_tpu.diffusion.dual_objective import (
    dsm_annealed_sampling,
    respaced_sigma_levels,
)

SIGMAS = np.geomspace(2.0, 0.01, 10)


def _run(m, n_steps=4):
    def eps_fn(pos, gate, time_step=None):
        return -0.1 * pos

    pos_init = jax.random.normal(jax.random.key(0), (2, 5, 3))
    mask = jnp.ones((2, 5), bool)
    pos, traj, nan = dsm_annealed_sampling(
        eps_fn, SIGMAS, pos_init, mask, jax.random.key(1),
        n_steps=n_steps, step_lr=1e-5, save_traj=True, sigma_respacing=m,
    )
    return np.asarray(pos), np.asarray(traj), bool(nan)


def test_full_ladder_is_identity():
    pos_none, traj_none, _ = _run(None)
    pos_full, traj_full, _ = _run(len(SIGMAS))
    np.testing.assert_array_equal(pos_none, pos_full)
    np.testing.assert_array_equal(traj_none, traj_full)


@pytest.mark.parametrize("m", [3, 5, 7])
def test_respaced_walk_runs_and_cost_scales(m):
    pos, traj, nan = _run(m)
    assert not nan and np.isfinite(pos).all()
    # cost scales with m: m levels x n_steps inner steps
    assert traj.shape[0] == m * 4


@pytest.mark.parametrize("m", [1, 2, 3, 5, 7, 9, 10])
def test_level_selection_contract(m):
    lvl = np.arange(10)
    out = respaced_sigma_levels(lvl, m)
    assert len(out) == m
    assert np.all(np.diff(out) > 0) or m == 1
    # the FINAL level (sigma_end) is always kept — the terminal noise scale
    # of the anneal never changes; for m >= 2 the first level is kept too
    assert out[-1] == 9
    if m >= 2:
        assert out[0] == 0


def test_min_sigma_composes_with_respacing():
    # kept levels after a min_sigma cut are a sub-range; respacing must keep
    # ITS endpoints (the cut ladder's first and last kept level)
    lvl = np.arange(3, 10)
    out = respaced_sigma_levels(lvl, 3)
    assert out[0] == 3 and out[-1] == 9 and len(out) == 3


def test_bad_m_raises():
    with pytest.raises(ValueError):
        _run(0)
    with pytest.raises(ValueError):
        _run(len(SIGMAS) + 1)
