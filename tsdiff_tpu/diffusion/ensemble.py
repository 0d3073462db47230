"""Ensemble score functions: vmap over stacked parameter pytrees.

The reference's ``EnsembleSampler`` loops over 8 trained models sequentially
and averages the per-edge score (reference models/sampler.py:95-111) — 8
kernel launches per step.  TPU-native: stack the 8 parameter pytrees along a
leading axis and ``vmap`` the forward, so the ensemble becomes one batched
program (the member axis fuses into the batched matmuls); the mean-reduction
over members happens on-chip.  With a mesh, the member axis can instead be
sharded across devices (see tsdiff_tpu/train/sharding.py).

Like the reference (which reuses member 0's edge_index for all members,
reference sampler.py:103 — valid because graph construction is deterministic
given identical inputs), the edge set is computed once.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tsdiff_tpu.core.graph import ReactionBatch
from tsdiff_tpu.diffusion.sampler import ScoreFn


def stack_params(params_list: list) -> dict:
    """Stack N compatible parameter pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def make_score_fn(model, params, batch: ReactionBatch) -> ScoreFn:
    """Single-model score function closed over the static graph inputs."""

    def score(pos: jax.Array):
        edge_inv, edges, d = model.apply(
            params,
            batch.atom_type,
            batch.r_feat,
            batch.p_feat,
            pos,
            batch.bond_mat,
            batch.node_mask,
        )
        return edge_inv, edges.mask_global, d

    return score


def make_ensemble_score_fn(model, stacked_params, batch: ReactionBatch) -> ScoreFn:
    """Mean-of-members score (reference models/sampler.py:95-111) via vmap."""

    def score(pos: jax.Array):
        def member(p):
            edge_inv, edges, d = model.apply(
                p,
                batch.atom_type,
                batch.r_feat,
                batch.p_feat,
                pos,
                batch.bond_mat,
                batch.node_mask,
            )
            return edge_inv, edges.mask_global, d

        edge_inv_m, emask_m, d_m = jax.vmap(member)(stacked_params)
        return jnp.mean(edge_inv_m, axis=0), emask_m[0], d_m[0]

    return score
