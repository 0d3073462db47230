"""Coverage for failure paths and secondary components."""

import numpy as np
import jax
import jax.numpy as jnp

from tsdiff_tpu.config import Config
from tsdiff_tpu.diffusion.sampler import SamplingSettings, dynamic_sampling
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
from tsdiff_tpu.models import get_model
from tsdiff_tpu.train.scheduler import ExpMinScheduler, get_scheduler

from test_condensenc import MODEL_CFG, make_batch


def test_nan_detection_flag():
    """A score function emitting NaN must raise the nan_detected flag
    (host retry path, reference models/sampler.py:248-250)."""
    schedule = DiffusionSchedule.from_config(MODEL_CFG)
    B, N = 1, 4
    node_mask = jnp.ones((B, N), dtype=bool)

    def bad_score(pos):
        ei = jnp.full((B, N, N, 1), jnp.nan)
        return ei, jnp.ones((B, N, N), bool) & ~jnp.eye(N, dtype=bool), jnp.ones((B, N, N))

    res = dynamic_sampling(
        bad_score, schedule, jnp.ones((B, N, 3)), node_mask,
        jax.random.key(0), SamplingSettings(sampling_type="ld", n_steps=2),
    )
    assert bool(res.nan_detected)


def test_gaussian_edge_encoder_path():
    cfg = Config(MODEL_CFG.to_dict())
    cfg.edge_encoder = "gaussian"
    model = get_model(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, [5, 7])
    params = model.init(
        jax.random.key(0),
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    ei, edges, d = model.apply(
        params, batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    assert np.isfinite(np.asarray(ei)).all()


def test_expmin_schedulers():
    s = get_scheduler(Config(type="expmin", factor=0.9, min_lr=0.5), base_lr=1.0)
    assert isinstance(s, ExpMinScheduler)
    lrs = [s.step() for _ in range(20)]
    assert abs(lrs[0] - 0.9) < 1e-9
    assert lrs[-1] == 0.5  # floored
    sd = s.state_dict()
    s2 = get_scheduler(Config(type="expmin", factor=0.9, min_lr=0.5), base_lr=1.0)
    s2.load_state_dict(sd)
    assert s2.lr == s.lr

    sm = get_scheduler(
        Config(type="expmin_milestone", factor=0.5, milestone=10, min_lr=0.01),
        base_lr=1.0,
    )
    for _ in range(10):
        lr = sm.step()
    assert abs(lr - 0.5) < 1e-6  # factor reached at the milestone


def test_clip_pos_and_save_traj():
    rng = np.random.default_rng(1)
    batch = make_batch(rng, [5], n_pad=8)
    model = get_model(MODEL_CFG)
    params = model.init(
        jax.random.key(0),
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    from tsdiff_tpu.diffusion.ensemble import make_score_fn

    schedule = DiffusionSchedule.from_config(MODEL_CFG)
    res = dynamic_sampling(
        make_score_fn(model, params, batch), schedule,
        jax.random.normal(jax.random.key(1), batch.pos.shape),
        batch.node_mask, jax.random.key(2),
        SamplingSettings(sampling_type="ld", n_steps=3, clip_pos=0.5, save_traj=True),
    )
    assert float(jnp.abs(res.pos).max()) <= 0.5 + 1e-6
    assert res.traj.shape[0] == 3


def test_blackhole_and_logger(tmp_path):
    from tsdiff_tpu.utils.misc import BlackHole, get_logger, get_new_log_dir

    bh = BlackHole()
    bh.anything.at.all("works")(1, 2)
    d = get_new_log_dir(str(tmp_path), prefix="x", tag="y")
    lg = get_logger("t_misc", d)
    lg.info("hello")
    import os

    assert os.path.exists(os.path.join(d, "log.txt"))


def test_phase_timer():
    from tsdiff_tpu.utils.profiling import PhaseTimer, timed_blocked

    t = PhaseTimer()
    with t.phase("a"):
        sum(range(1000))
    assert "a" in t.summary()
    dt, out = timed_blocked(lambda: jnp.ones(4).sum())
    assert float(out) == 4.0 and dt >= 0
