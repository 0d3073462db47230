"""DDPM denoising objective for the condensed TS model.

Re-derivation of ``CondenseEncoderEpsNetwork.get_loss``
(reference models/epsnet/condensenc.py:267-328) on padded dense batches with
explicit jax.random key threading (the reference uses global torch RNG;
distributional — not bitwise — parity is the contract, SURVEY.md section 7).

Steps:
  1. antithetic timestep sampling: half_1 ~ U[t0, t1), half_2 = t0+t1-1-half_1
     (variance reduction, reference condensenc.py:285-291);
  2. perturb coordinates in the scaled frame:
     pos_pert = pos + eps * sqrt(1-abar)/sqrt(abar)       (condensenc.py:294-297);
  3. network predicts per-pair distance scores on the perturbed geometry;
     chain rule to per-atom vectors via eq_transform       (condensenc.py:300-307);
  4. target: d_target = (d_gt - d_pert) * sqrt(abar)/sqrt(1-abar) on the same
     edge set, chain-ruled identically                     (condensenc.py:314-322);
  5. per-atom squared error summed over xyz                (condensenc.py:325-327).

``loss_node`` is (B, N); the scalar reduction divides by the number of REAL
atoms (the reference's ``loss.mean()`` over the concatenated node axis,
reference train.py:140-142).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tsdiff_tpu.core.geometry import eq_transform, pairwise_distance
from tsdiff_tpu.core.graph import ReactionBatch
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule


def sample_antithetic_timesteps(
    key: jax.Array, num_graphs: int, t0: int, t1: int
) -> jax.Array:
    """(G,) int32 timesteps, antithetically paired (reference condensenc.py:288-291)."""
    sz = num_graphs // 2 + 1
    half_1 = jax.random.randint(key, (sz,), t0, t1)
    half_2 = t0 + t1 - 1 - half_1
    return jnp.concatenate([half_1, half_2])[:num_graphs]


def diffusion_loss(
    model,
    params,
    schedule: DiffusionSchedule,
    batch: ReactionBatch,
    key: jax.Array,
    t0: int = 0,
    t1: int | None = None,
) -> tuple[jax.Array, dict]:
    """Scalar loss (mean over real atoms) + aux dict.

    ``t0``/``t1`` bound the sampled timestep range (config keys with defaults
    0 / num_timesteps, reference condensenc.py:285-286).
    """
    if t1 is None:
        t1 = schedule.num_timesteps
    if getattr(model, "fused_score", False):
        # The fused Pallas score kernel is inference-only (no VJP); training
        # always takes the XLA path so a sampling config with
        # ``fused_score: true`` trains instead of failing at trace time.
        model = model.clone(fused_score=False)
    key_t, key_eps = jax.random.split(key)

    G = batch.batch_size
    t = sample_antithetic_timesteps(key_t, G, t0, t1)
    a = schedule.alphas[t]  # (G,)
    a_pos = a[:, None, None]

    node_mask_f = batch.node_mask[..., None].astype(batch.pos.dtype)
    noise = jax.random.normal(key_eps, batch.pos.shape, batch.pos.dtype)
    pos_perturbed = batch.pos + noise * jnp.sqrt(1.0 - a_pos) / jnp.sqrt(a_pos)
    pos_perturbed = pos_perturbed * node_mask_f

    a_edge = a[:, None, None]  # broadcast over the pair grid
    if getattr(model, "packed_train", False):
        # offset-packed forward + chain rule (2x pair-FLOP cut; identical
        # semantics, parity-tested against the dense path)
        from tsdiff_tpu.core.packed import eq_transform_packed, packed_distance

        pp = model.precompute_packed_pairs(batch.bond_mat, batch.node_mask)

        def fwd(mdl):
            z = mdl.node_states(
                batch.atom_type, batch.r_feat, batch.p_feat, batch.node_mask
            )
            return mdl.score_step_packed_xla(
                pos_perturbed, batch.node_mask, z, pp
            )

        score, info = model.apply(params, method=fwd)
        node_eq = eq_transform_packed(score, pos_perturbed, info.m_eq, info.d_out)
        mask_out = info.m_eq > 0
        d_gt = packed_distance(batch.pos, mask_out)
        d_target = (d_gt - info.d_out) / jnp.sqrt(1.0 - a_edge) * jnp.sqrt(a_edge)
        pos_target = eq_transform_packed(
            d_target, pos_perturbed, info.m_eq, info.d_out
        )
    else:
        edge_inv, edges, d_perturbed = model.apply(
            params,
            batch.atom_type,
            batch.r_feat,
            batch.p_feat,
            pos_perturbed,
            batch.bond_mat,
            batch.node_mask,
        )
        emask = edges.mask_global
        node_eq = eq_transform(edge_inv, pos_perturbed, emask, d_perturbed)

        d_gt = pairwise_distance(batch.pos, emask)
        d_target = (d_gt - d_perturbed) / jnp.sqrt(1.0 - a_edge) * jnp.sqrt(a_edge)
        pos_target = eq_transform(d_target, pos_perturbed, emask, d_perturbed)

    loss_node = jnp.sum((node_eq - pos_target) ** 2, axis=-1)  # (B, N)
    mask = batch.node_mask.astype(loss_node.dtype)
    n_real = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(loss_node * mask) / n_real
    aux = {
        "loss_sum": jnp.sum(loss_node * mask),
        "n_nodes": jnp.sum(mask),
        "timesteps": t,
    }
    return loss, aux
