"""Symmetric-pair packing in OFFSET layout — the round-2 2x FLOP cut.

Every per-pair tensor in the condensed TS model is symmetric in (i, j):
bond_mat, distances, type_r/p, h_i*h_j, hence edge_attr and edge_inv (the
reference's edge list simply carries both directions with identical values,
reference models/common.py:186-202).  The dense (B, N, N) pair grid therefore
does every pair-MLP twice.

This module packs pairs by CIRCULAR OFFSET: packed row (k, i) for
k = 1..K (K = N//2) represents the unordered pair {i, (i+k) mod N}.  Each
unordered pair appears exactly once — except at offset k = K (N even), where
rows (K, i) and (K, i+K) are duplicates; sum-aggregations scale that slab by
0.5 (``half_last_slab_mask``).

Why offsets instead of upper-triangular packing: the CFConv aggregation
``agg[j] = sum_i w[i, j] * xh[i]`` and the eq_transform chain rule become
CIRCULAR ROLLS along the node axis —

    agg = sum_k  roll(w_k * xh, +k)  +  w_k * roll(xh, -k)

pure vector-unit work with zero gather/scatter and zero extra MXU passes,
whereas triangular packing needs one-hot mirror matmuls whose k=N contraction
is MXU-hostile.  Rolls map directly to the TPU sublane-rotate primitive
(``pltpu.roll`` inside the Pallas kernel, ``jnp.roll`` here).

Layout convention everywhere: packed arrays are (B, K, N, ...) with
``packed[b, k-1, i] = dense[b, i, (i+k) % N]``.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


def packed_index_arrays(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(rows, cols) index arrays of shape (K, N): packed (k, i) <-> dense
    (rows[k,i], cols[k,i]) = (i, (i+k+1) % n)."""
    assert n % 2 == 0, f"offset packing requires even N, got {n}"
    k = n // 2
    rows = np.broadcast_to(np.arange(n), (k, n))
    cols = (rows + np.arange(1, k + 1)[:, None]) % n
    return rows, cols


def pack_pairs(dense: jax.Array) -> jax.Array:
    """(B, N, N, ...) -> (B, K, N, ...) offset-packed."""
    n = dense.shape[1]
    rows, cols = packed_index_arrays(n)
    return dense[:, rows, cols]


def unpack_pairs(packed: jax.Array, fill=0) -> jax.Array:
    """(B, K, N, ...) -> symmetric (B, N, N, ...); the diagonal gets ``fill``."""
    b, k, n = packed.shape[:3]
    rows, cols = packed_index_arrays(n)
    out = jnp.full((b, n, n, *packed.shape[3:]), fill, packed.dtype)
    out = out.at[:, rows, cols].set(packed)
    return out.at[:, cols, rows].set(packed)


def half_last_slab_mask(n: int, dtype=jnp.float32) -> jax.Array:
    """(K, 1) multiplier: 1 everywhere, 0.5 on the k = N/2 slab (whose rows
    cover each unordered pair twice)."""
    k = n // 2
    m = np.ones((k, 1), np.float32)
    m[-1] = 0.5
    return jnp.asarray(m, dtype)


def packed_diff(pos: jax.Array) -> jax.Array:
    """(B, N, 3) -> (B, K, N, 3): diff[k-1, i] = pos[i] - pos[(i+k) % N]."""
    n = pos.shape[1]
    return jnp.stack(
        [pos - jnp.roll(pos, -k, axis=1) for k in range(1, n // 2 + 1)], axis=1
    )


def packed_valid_mask(node_mask: jax.Array) -> jax.Array:
    """(B, N) bool -> (B, K, N) bool: both endpoints are real atoms."""
    n = node_mask.shape[1]
    return jnp.stack(
        [node_mask & jnp.roll(node_mask, -k, axis=1) for k in range(1, n // 2 + 1)],
        axis=1,
    )


def packed_distance(pos: jax.Array, pmask: jax.Array) -> jax.Array:
    """Masked packed pair distances; entries outside ``pmask`` are 1.0 (same
    dummy convention as core.geometry.pairwise_distance)."""
    diff = packed_diff(pos)
    sq = jnp.sum(diff * diff, axis=-1)
    safe = jnp.maximum(jnp.where(pmask, sq, 1.0), 1e-24)
    return jnp.where(pmask, jnp.sqrt(safe), 1.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedPairs:
    """Offset-packed, position-INDEPENDENT typed pair structures — the packed
    counterpart of core.graph_ops.StaticPairs; computed once per batch."""

    mask_local_in: jax.Array   # (B, K, N) bool
    type_r_in: jax.Array       # (B, K, N) int32
    type_p_in: jax.Array
    mask_local_out: jax.Array
    type_r_out: jax.Array
    type_p_out: jax.Array


def pack_static_pairs(sp) -> PackedPairs:
    """core.graph_ops.StaticPairs (dense) -> PackedPairs (offset layout)."""
    return PackedPairs(
        mask_local_in=pack_pairs(sp.mask_local_in),
        type_r_in=pack_pairs(sp.type_r_in),
        type_p_in=pack_pairs(sp.type_p_in),
        mask_local_out=pack_pairs(sp.mask_local_out),
        type_r_out=pack_pairs(sp.type_r_out),
        type_p_out=pack_pairs(sp.type_p_out),
    )


def eq_transform_packed(
    score_p: jax.Array,   # (B, K, N) packed per-pair distance scores
    pos: jax.Array,       # (B, N, 3)
    m_eq: jax.Array,      # (B, K, N) float edge mask WITH the 0.5 K-slab factor
    d_safe: jax.Array,    # (B, K, N) masked packed distances
) -> jax.Array:
    """Packed form of core.geometry.eq_transform (reference models/geometry.py:
    22-30).  For symmetric scores the dense version gives
    ``score_pos[i] = sum_j 2 m_ij s_ij (r_i - r_j) / d_ij``; per packed row
    (k, i) the pair contributes +2ws*diff at node i and -2ws*diff at node
    (i+k) % N — the latter is a +k circular roll."""
    w = 2.0 * m_eq * score_p / d_safe  # (B, K, N)
    out = jnp.zeros_like(pos)
    n = pos.shape[1]
    for k in range(1, n // 2 + 1):
        diff = pos - jnp.roll(pos, -k, axis=1)          # r_i - r_{(i+k)%N}
        c = w[:, k - 1, :, None] * diff                  # at node i
        out = out + c - jnp.roll(c, k, axis=1)           # minus at node (i+k)%N
    return out
