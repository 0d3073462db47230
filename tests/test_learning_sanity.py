"""End-to-end learning sanity: training must make sampled geometries match
the data distribution measurably better than an untrained model.

This is the strongest correctness gate available without the wb97xd3 corpus:
it exercises the full loss -> gradient -> sampler -> D-MAE loop on a tiny
synthetic dataset of fixed 3D structures.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsdiff_tpu.config import Config
from tsdiff_tpu.core.graph import from_numpy_graphs
from tsdiff_tpu.diffusion.ensemble import make_score_fn
from tsdiff_tpu.diffusion.sampler import SamplingSettings, dynamic_sampling
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
from tsdiff_tpu.eval.dmae import calc_dmae
from tsdiff_tpu.models import get_model
from tsdiff_tpu.train import init_train_state, make_optimizer, make_train_step

from tsdiff_tpu.chem import NUM_BOND_TYPES

CFG = Config(
    network="condensenc",
    edge_cutoff=10.0,
    edge_order=3,
    pred_edge_order=3,
    encoder=dict(
        name="schnet", edge_emb=False, num_convs=3, cutoff=10.0,
        smooth_conv=False, mlp_act="swish", hidden_dim=32,
    ),
    feat_dim=4,
    hidden_dim=32,
    edge_encoder="mlp",
    mlp_act="swish",
    edge_cat_act="swish",
    beta_schedule="sigmoid",
    beta_start=1e-7,
    beta_end=2e-3,
    num_diffusion_timesteps=100,
)


def _chain_molecule(rng, n):
    """A bent chain with ~1.5 A bonds — a plausible rigid 3D structure."""
    pos = np.zeros((n, 3), np.float32)
    direction = np.array([1.0, 0.0, 0.0])
    for i in range(1, n):
        wiggle = rng.normal(scale=0.4, size=3)
        direction = direction + wiggle
        direction /= np.linalg.norm(direction)
        pos[i] = pos[i - 1] + 1.5 * direction
    pos -= pos.mean(axis=0)
    bm = np.zeros((n, n), np.int64)
    code = 1 * NUM_BOND_TYPES + 1
    for i in range(n - 1):
        bm[i, i + 1] = bm[i + 1, i] = code
    return pos.astype(np.float32), bm


@pytest.mark.slow
def test_training_improves_sampled_dmae():
    rng = np.random.default_rng(0)
    n, n_pad = 6, 8
    graphs = []
    for g in range(4):
        pos, bm = _chain_molecule(rng, n)
        graphs.append(
            dict(
                atom_type=np.full(n, 6, np.int32),
                r_feat=np.eye(4, dtype=np.float32)[np.full(n, g % 4)],
                p_feat=np.eye(4, dtype=np.float32)[np.full(n, (g + 1) % 4)],
                pos=pos,
                bond_mat=bm,
            )
        )
    batch = from_numpy_graphs(graphs, max_nodes=n_pad)

    model = get_model(CFG)
    schedule = DiffusionSchedule.from_config(CFG)
    params0 = model.init(
        jax.random.key(0),
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    tx = make_optimizer(
        Config(type="adam", lr=2e-3, weight_decay=0.0, beta1=0.95, beta2=0.999),
        max_grad_norm=3000.0,
    )
    state = init_train_state(model, tx, params0)
    step = make_train_step(model, tx, schedule)

    # NOTE: the per-step loss is extremely noisy in t (the DDPM target scale
    # varies by orders of magnitude across timesteps), so the gate is the
    # sampled-geometry D-MAE below, not the loss curve.
    key = jax.random.key(1)
    for it in range(3000):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k, 2e-3)
    assert np.isfinite(float(metrics["loss"]))

    def sample(params, key):
        settings = SamplingSettings(sampling_type="ddpm", n_steps=CFG.num_diffusion_timesteps)
        res = dynamic_sampling(
            make_score_fn(model, params, batch),
            schedule,
            jax.random.normal(key, batch.pos.shape),
            batch.node_mask,
            key,
            settings,
        )
        return np.asarray(res.pos)

    pos_untrained = sample(params0, jax.random.key(7))
    pos_trained = sample(state.params, jax.random.key(7))

    def mean_dmae(pos_gen):
        vals = []
        for b, g in enumerate(graphs):
            vals.append(calc_dmae(g["pos"], pos_gen[b, :n]))
        return float(np.mean(vals))

    d_untrained = mean_dmae(pos_untrained)
    d_trained = mean_dmae(pos_trained)
    assert np.isfinite(d_trained)
    assert d_trained < 0.6 * d_untrained, (
        f"sampling quality did not improve: untrained D-MAE {d_untrained:.3f}, "
        f"trained {d_trained:.3f}"
    )

    # bf16 network compute must preserve sampling quality (the bench config):
    # same trained params, bf16 model, same keys -> D-MAE within 20% + 0.05 A.
    model_bf16 = get_model(CFG, dtype=jnp.bfloat16)

    def sample_bf16(params, key):
        settings = SamplingSettings(sampling_type="ddpm", n_steps=CFG.num_diffusion_timesteps)
        res = dynamic_sampling(
            make_score_fn(model_bf16, params, batch),
            schedule,
            jax.random.normal(key, batch.pos.shape),
            batch.node_mask,
            key,
            settings,
        )
        return np.asarray(res.pos)

    d_bf16 = mean_dmae(sample_bf16(state.params, jax.random.key(7)))
    assert d_bf16 < 1.2 * d_trained + 0.05, (
        f"bf16 sampling degraded quality: f32 D-MAE {d_trained:.3f}, bf16 {d_bf16:.3f}"
    )

    # int8 quantized packed kernel (the N=24-bucket bench config) must
    # preserve sampling quality too: same gate as bf16.
    from tsdiff_tpu.diffusion.ensemble import make_ensemble_score_fn, stack_params

    model_int8 = get_model(CFG).clone(fused_score=True, score_quant="int8")

    def sample_int8(params, key):
        settings = SamplingSettings(sampling_type="ddpm", n_steps=CFG.num_diffusion_timesteps)
        res = dynamic_sampling(
            make_ensemble_score_fn(model_int8, stack_params([params]), batch),
            schedule,
            jax.random.normal(key, batch.pos.shape),
            batch.node_mask,
            key,
            settings,
        )
        return np.asarray(res.pos)

    d_int8 = mean_dmae(sample_int8(state.params, jax.random.key(7)))
    assert d_int8 < 1.2 * d_trained + 0.05, (
        f"int8 sampling degraded quality: f32 D-MAE {d_trained:.3f}, int8 {d_int8:.3f}"
    )
