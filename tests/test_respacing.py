"""Respaced (strided-subsequence) sampling — correctness and quality gates.

The reference's `generalized` rule is its own step-skipping mechanism
(reference dualenc.py:871-908); the ddpm variants respace the same way
because every update-rule formula is written in terms of (alpha_i, alpha_j)
where j is the PREVIOUS element of the walked timestep sequence (reference
sampler.py:149-182: ``seq_next = [-1] + seq[:-1]``).  Respacing replaces the
contiguous ``seq`` with an evenly-strided subsequence — the standard DDIM
construction — cutting per-sample cost by ~n_steps/m at (gated) equal
quality.
"""

import math

import numpy as np
import jax
import pytest

from tsdiff_tpu.config import Config
from tsdiff_tpu.diffusion.sampler import (
    SamplingSettings,
    build_step_coeffs,
    dynamic_sampling,
    final_frame_scale,
)
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule


SCHEDULE = DiffusionSchedule.from_config(
    Config(
        beta_schedule="sigmoid",
        beta_start=1e-7,
        beta_end=2e-3,
        num_diffusion_timesteps=100,
    )
)


def test_respacing_none_and_full_are_identical():
    base = SamplingSettings("ddpm", n_steps=100)
    full = SamplingSettings("ddpm", n_steps=100, timestep_respacing=100)
    c0 = build_step_coeffs(SCHEDULE, base)
    c1 = build_step_coeffs(SCHEDULE, full)
    for f in c0._fields:
        np.testing.assert_array_equal(getattr(c0, f), getattr(c1, f))


@pytest.mark.parametrize("m", [2, 7, 25, 50, 99])
def test_respaced_subsequence_structure(m):
    co = build_step_coeffs(
        SCHEDULE, SamplingSettings("ddpm", n_steps=100, timestep_respacing=m)
    )
    ts = co.timesteps
    assert ts[0] == 99 and ts[-1] == 0  # both window endpoints kept
    assert len(ts) <= m
    assert np.all(np.diff(ts) < 0)  # strictly descending (unique)
    # the trajectory-rescale alphas follow the walked subsequence
    alphas = np.asarray(SCHEDULE.alphas, dtype=np.float64)
    np.testing.assert_allclose(co.alphas_i, alphas[ts].astype(np.float32))


def test_respaced_window_with_denoise_from_time_t():
    # entry mode (b): window [t_end - n, t_end) = [20, 60), respaced to 5
    co = build_step_coeffs(
        SCHEDULE,
        SamplingSettings(
            "ddpm", n_steps=40, denoise_from_time_t=60, timestep_respacing=5
        ),
    )
    assert co.timesteps[0] == 59 and co.timesteps[-1] == 20
    assert len(co.timesteps) == 5
    # final-frame scale unchanged by respacing (last walked index identical)
    s_full = final_frame_scale(
        SCHEDULE, SamplingSettings("ddpm", n_steps=40, denoise_from_time_t=60)
    )
    s_resp = final_frame_scale(
        SCHEDULE,
        SamplingSettings(
            "ddpm", n_steps=40, denoise_from_time_t=60, timestep_respacing=5
        ),
    )
    assert s_full == s_resp


def test_respacing_validation():
    with pytest.raises(ValueError):
        build_step_coeffs(
            SCHEDULE, SamplingSettings("ddpm", n_steps=50, timestep_respacing=0)
        )
    with pytest.raises(ValueError):
        build_step_coeffs(
            SCHEDULE, SamplingSettings("ddpm", n_steps=50, timestep_respacing=51)
        )


@pytest.mark.parametrize("st", ["ddpm", "ddpm_noisy", "ddpm_det", "generalized", "ld"])
def test_respaced_coefficients_match_reference_formulas(st):
    """Transcribe the reference update formulas (sampler.py:215-244,
    dualenc.py:871-944) at the respaced (i, j) pairs — j = previous
    subsequence element, alpha_{-1} = 1 — and compare every coefficient."""
    alphas = np.asarray(SCHEDULE.alphas, dtype=np.float64)
    m, n, lr, eta = 9, 100, 1e-6, 0.7
    co = build_step_coeffs(
        SCHEDULE,
        SamplingSettings(st, n_steps=n, step_lr=lr, eta=eta, timestep_respacing=m),
    )
    seq = co.timesteps.astype(int)
    for k, i in enumerate(seq):
        j = int(seq[k + 1]) if k + 1 < len(seq) else -1
        at = float(alphas[i])
        atm1 = float(alphas[j]) if j >= 0 else 1.0
        sig = math.sqrt(1 - at) / math.sqrt(at)
        mask = 0.0 if i == 0 else 1.0
        gap = i - j  # LD-family steps scale with consumed schedule entries
        if st == "ld":
            step = lr * (sig / 0.01) ** 2 * gap
            a, b, c = 1.0, step / sig, math.sqrt(2 * step)
        elif st == "ddpm":
            beta = 1 - at / atm1
            denom = (1 - at) * math.sqrt(atm1)
            a = (math.sqrt(atm1) * beta
                 + math.sqrt(1 - beta) * (1 - atm1) * math.sqrt(at)) / denom
            b = math.sqrt(atm1) * beta * math.sqrt(1 / at - 1) / denom
            c = mask * math.sqrt(beta) / math.sqrt(atm1)
        elif st in ("ddpm_noisy", "ddpm_det"):
            beta = 1 - at / atm1
            a = (math.sqrt(atm1) * beta * math.sqrt(1 / at)
                 + math.sqrt(1 - beta) * (1 - atm1)) / (1 - at)
            b = math.sqrt(atm1) * beta * math.sqrt(1 / at - 1) / (1 - at)
            if st == "ddpm_noisy":
                c = mask * math.sqrt(beta)
            else:
                c = mask * math.sqrt(beta * (1 - atm1) / (1 - at))
        else:  # generalized
            c1 = eta * math.sqrt((1 - at / atm1) * (1 - atm1) / (1 - at))
            c2 = math.sqrt(max((1 - atm1) - c1 ** 2, 0.0))
            sp_ld = lr * (sig / 0.01) ** 2 * gap / sig
            sp_gen = 5 * (math.sqrt(1 - at) / math.sqrt(at) - c2 / math.sqrt(atm1))
            sn_ld = math.sqrt(lr * (sig / 0.01) ** 2 * gap * 2)
            sn_gen = 3 * (c1 / math.sqrt(atm1))
            a, b, c = 1.0, min(sp_ld, sp_gen), min(sn_ld, sn_gen)
        np.testing.assert_allclose(co.a[k], a, rtol=1e-5, err_msg=f"{st} a i={i} j={j}")
        np.testing.assert_allclose(co.b[k], b, rtol=1e-5, err_msg=f"{st} b i={i} j={j}")
        np.testing.assert_allclose(co.c[k], c, rtol=1e-5, atol=1e-8,
                                   err_msg=f"{st} c i={i} j={j}")


@pytest.mark.slow
def test_respaced_sampling_quality_gate():
    """Train the tiny learning-gate model, then sample the full 100-step ddpm
    schedule vs respaced 50- and 25-step schedules.

    This is a STRUCTURAL gate (respaced sampling still converges to the data,
    degradation stays bounded), not an equal-quality claim: the tiny
    time-unconditioned toy at T=100 measurably degrades ~30-40% at half
    steps, and single-key D-MAE on 4 six-atom graphs is very noisy (observed
    run-to-run swings >2x), so the gate averages over sampling keys and
    bounds the ratio loosely.  The production-regime (T=5000, trained
    ensemble) equal-quality question is answered by the committed on-chip
    degradation curve: artifacts/respacing_curve.json via
    tools/respacing_curve.py — see BENCH_NOTES.md."""
    from tests.test_learning_sanity import CFG, _chain_molecule
    from tsdiff_tpu.chem import NUM_BOND_TYPES  # noqa: F401  (fixture parity)
    from tsdiff_tpu.core.graph import from_numpy_graphs
    from tsdiff_tpu.diffusion.ensemble import make_score_fn
    from tsdiff_tpu.eval.dmae import calc_dmae
    from tsdiff_tpu.models import get_model
    from tsdiff_tpu.train import init_train_state, make_optimizer, make_train_step

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
    key = jax.random.key(1)
    for _ in range(3000):
        key, k = jax.random.split(key)
        state, _ = step(state, batch, k, 2e-3)

    KEYS = (7, 11, 13, 17)  # average several sampling keys: single-key D-MAE
    # on 4 tiny graphs swings >2x run to run

    def mean_dmae(params, respacing):
        vals = []
        for seed in KEYS:
            settings = SamplingSettings(
                sampling_type="ddpm",
                n_steps=CFG.num_diffusion_timesteps,
                timestep_respacing=respacing,
            )
            res = dynamic_sampling(
                make_score_fn(model, params, batch),
                schedule,
                jax.random.normal(jax.random.key(seed), batch.pos.shape),
                batch.node_mask,
                jax.random.key(seed),
                settings,
            )
            pos_gen = np.asarray(res.pos)
            vals.extend(
                calc_dmae(g["pos"], pos_gen[b, :n]) for b, g in enumerate(graphs)
            )
        return float(np.mean(vals))

    d_untrained = mean_dmae(params0, None)
    d_full = mean_dmae(state.params, None)
    d_half = mean_dmae(state.params, 50)
    d_quarter = mean_dmae(state.params, 25)

    assert d_full < 0.6 * d_untrained  # the learning gate itself
    # respaced runs still converge to the data (far better than untrained)
    # and degradation vs the full schedule stays bounded
    assert d_half < 0.5 * d_untrained and d_half < 1.7 * d_full + 0.05, (
        f"50-step respaced broke: untrained {d_untrained:.3f}, "
        f"full {d_full:.3f}, half {d_half:.3f}"
    )
    assert d_quarter < 0.6 * d_untrained and d_quarter < 2.0 * d_full + 0.08, (
        f"25-step respaced broke: untrained {d_untrained:.3f}, "
        f"full {d_full:.3f}, quarter {d_quarter:.3f}"
    )
