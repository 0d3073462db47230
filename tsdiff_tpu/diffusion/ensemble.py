"""Ensemble score functions: vmap over stacked parameter pytrees.

The reference's ``EnsembleSampler`` loops over 8 trained models sequentially
and averages the per-edge score (reference models/sampler.py:95-111) — 8
kernel launches per step, each rebuilding the full graph and all embeddings.
TPU-native:

  * the 8 parameter pytrees are stacked along a leading axis and the forward
    is ``vmap``ed — one batched program whose member axis fuses into the
    batched matmuls (or shards over an ``ens`` mesh axis);
  * ALL position-independent work — node states, typed order extension, bond
    embeddings (``StaticFeatures``) — is computed once per batch at closure
    build time; each scan step runs only ``score_step`` (distance masking +
    distance MLP + SchNet stack + head);
  * the per-step radius mask / distances are member-invariant and computed
    once outside the member vmap (the reference itself exploits this by
    reusing member 0's edge_index, reference sampler.py:103).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tsdiff_tpu.core.graph import ReactionBatch
from tsdiff_tpu.diffusion.sampler import ScoreFn


def stack_params(params_list: list) -> dict:
    """Stack N compatible parameter pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def make_score_fn(model, params, batch: ReactionBatch) -> ScoreFn:
    """Single-model score function with hoisted static features."""
    static = model.apply(
        params,
        batch.atom_type,
        batch.r_feat,
        batch.p_feat,
        batch.bond_mat,
        batch.node_mask,
        method="precompute_static",
    )

    def score(pos: jax.Array):
        edge_inv, edges, d = model.apply(
            params, pos, batch.node_mask, static, method="score_step"
        )
        return edge_inv, edges.mask_global, d

    return score


def make_packed_ensemble_eps_fn(model, stacked_params, batch: ReactionBatch):
    """Offset-packed ensemble fast path: returns a function pos -> node_eq
    (the per-atom score BEFORE clip_norm), marked ``returns_node_eq`` so the
    sampler skips its dense eq_transform.

    Halves the pair-MLP FLOPs of the dense path (every pair tensor is
    symmetric; see tsdiff_tpu/core/packed.py) and embeds bond types in-kernel
    (no per-step HBM streaming of static embedding tensors).  Packed pair
    structures and per-step masks/distances are member-invariant; only the
    node states z and the weights are per-member (vmapped).
    """
    from tsdiff_tpu.core.packed import eq_transform_packed

    if getattr(model, "score_quant", None) == "int8":
        from tsdiff_tpu.ops.pallas.condensed_score_packed_int8 import (
            extract_weights_packed_int8 as extract_weights_packed,
            packed_score_pallas_int8 as packed_score_pallas,
        )
    else:
        from tsdiff_tpu.ops.pallas.condensed_score_packed import (
            extract_weights_packed,
            packed_score_pallas,
        )

    pp = model.precompute_packed_pairs(batch.bond_mat, batch.node_mask)
    z_m = jax.vmap(
        lambda p: model.apply(
            p, batch.atom_type, batch.r_feat, batch.p_feat, batch.node_mask,
            method="node_states",
        )
    )(stacked_params)
    weights_m = jax.vmap(extract_weights_packed)(stacked_params)
    interpret = jax.default_backend() != "tpu"
    dtype = model.dtype or jnp.float32

    def node_eq_fn(pos: jax.Array) -> jax.Array:
        info = model.build_packed_pair_info(pos, batch.node_mask, pp)

        def member(w, z):
            return packed_score_pallas(
                w, z, info.d_in, info.cmask,
                pp.type_r_in, pp.type_p_in, pp.type_r_out, pp.type_p_out,
                num_blocks=model.num_convs, dtype=dtype, interpret=interpret,
            )

        score = jnp.mean(jax.vmap(member)(weights_m, z_m), axis=0)
        return eq_transform_packed(score, pos, info.m_eq, info.d_out)

    node_eq_fn.returns_node_eq = True
    return node_eq_fn


def make_ensemble_score_fn(model, stacked_params, batch: ReactionBatch) -> ScoreFn:
    """Mean-of-members score (reference models/sampler.py:95-111) via vmap.

    The typed pair structures and the per-step radius mask / distances are
    member-invariant: computed once and broadcast into the member vmap
    (in_axes=None).

    When the model is configured with ``fused_score=True`` this returns the
    offset-packed fast path (``make_packed_ensemble_eps_fn``) — same contract
    for the sampler, ~2x fewer pair-MLP FLOPs.
    """
    if getattr(model, "fused_score", False):
        return make_packed_ensemble_eps_fn(model, stacked_params, batch)
    pairs = model.precompute_pairs(batch.bond_mat, batch.node_mask)
    statics = jax.vmap(
        lambda p: model.apply(
            p,
            batch.atom_type,
            batch.r_feat,
            batch.p_feat,
            batch.bond_mat,
            batch.node_mask,
            method="precompute_static",
        )
    )(stacked_params)

    def score(pos: jax.Array):
        pair_info = model.build_pair_info(pos, batch.node_mask, pairs)

        def member(p, st):
            return model.apply(
                p, pos, batch.node_mask, st, pair_info, method="score_step"
            )[0]

        edge_inv_m = jax.vmap(member, in_axes=(0, 0))(stacked_params, statics)
        _, _, edges_out, d_out = pair_info
        return jnp.mean(edge_inv_m, axis=0), edges_out.mask_global, d_out

    return score
