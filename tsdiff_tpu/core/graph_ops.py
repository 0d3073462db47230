"""Batched dense graph construction — TPU-native form of the reference's
graph-extension layer.

Re-derives, on fixed-shape dense pair grids, the exact semantics of:

  * ``_extend_ts_graph_order``            (reference models/common.py:115-202)
  * ``_extend_to_radius_graph``           (reference models/common.py:328-384)
  * ``extend_ts_graph_order_radius``      (reference models/common.py:205-223)
  * the dense-adjacency recomposition in
    ``CondenseEncoderEpsNetwork._extend_condensed_graph_edge``
                                          (reference models/epsnet/condensenc.py:117-154)
  * ``_extend_graph_order`` /
    ``extend_graph_order_radius``         (reference models/common.py:255-325, 387-417)
    for the GeoDiff-legacy single-graph ("dualenc") path.

Semantics (verified against a numpy re-derivation in tests/test_graph_ops.py):

  Given condensed bond types T = r*22 + p on the 2D reaction graph,
    - split into per-R and per-P bond-type matrices (r = T // 22, p = T % 22);
    - build each side's higher-order adjacency: hop count 1..order via
      boolean adjacency powers; k-hop (k>=2) edges get type 22 + k - 1;
    - the local edge set is the union of R-side and P-side edges, carrying
      separate ``type_r``/``type_p`` vectors (0 where that side has no edge);
    - the global edge set is the union of the local set with the radius graph
      (all intra-graph pairs with distance <= cutoff, no self-loops); radius-
      only edges have type 0 on both sides.

Everything is (B, N, N) dense and composed with ``jnp.where`` masks: the
reference's sparse-coalesce plumbing disappears entirely, and the adjacency
powers are batched int matmuls that XLA tiles onto the MXU.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from tsdiff_tpu.chem import NUM_BOND_TYPES


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphEdges:
    """Dense edge sets for one padded batch.

    ``mask_global`` is the edge set the score network runs message passing
    over (local ∪ radius); ``mask_local`` is the order-extended 2D edge set.
    ``type_r`` / ``type_p`` are defined on the *global* grid (0 = typeless /
    radius-only), matching edge_type_global_r/p of reference
    models/epsnet/condensenc.py:146-152.
    """

    mask_global: jax.Array  # (B, N, N) bool
    mask_local: jax.Array   # (B, N, N) bool
    type_r: jax.Array       # (B, N, N) int32
    type_p: jax.Array       # (B, N, N) int32


def pair_mask(node_mask: jax.Array) -> jax.Array:
    """(B,N) node mask -> (B,N,N) off-diagonal real-pair mask."""
    m = node_mask[:, :, None] & node_mask[:, None, :]
    eye = jnp.eye(node_mask.shape[-1], dtype=bool)
    return m & ~eye


def higher_order_adj(adj: jax.Array, order: int) -> jax.Array:
    """Hop-count matrix: entry = k if the shortest path is k hops (1<=k<=order), else 0.

    Dense-batched re-derivation of ``get_higher_order_adj_matrix``
    (reference models/common.py:119-143): powers of the self-looped binarized
    adjacency, differenced to extract the first hop at which a pair connects.

    Args:
      adj: (..., N, N) bool/int adjacency (no self loops required).
    Returns:
      (..., N, N) int32 hop counts, 0 on the diagonal and for pairs farther
      than ``order`` hops.
    """
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=jnp.int32)
    a0 = jnp.broadcast_to(eye, adj.shape).astype(jnp.int32)
    a1 = ((adj.astype(jnp.int32) + eye) > 0).astype(jnp.int32)

    mats = [a0, a1]
    for _ in range(2, order + 1):
        # int32 matmul on (B, N, N): batched, MXU-tiled by XLA.
        nxt = (jnp.matmul(mats[-1], a1) > 0).astype(jnp.int32)
        mats.append(nxt)

    order_mat = jnp.zeros_like(a0)
    for k in range(1, order + 1):
        order_mat = order_mat + (mats[k] - mats[k - 1]) * k
    return order_mat


def _typed_higher_order(type_mat: jax.Array, order: int) -> jax.Array:
    """One side (R or P) of the TS extension: direct bond types + hop types.

    Mirrors reference models/common.py:158-169 (R side) / 172-184 (P side):
    k-hop (k >= 2) pairs get type ``NUM_BOND_TYPES + k - 1``; direct bonds
    keep their bond type.  The two cannot overlap (a 1-hop pair has hop
    count 1), which the reference asserts at models/common.py:168.
    """
    adj = type_mat > 0
    hop = higher_order_adj(adj, order)
    type_high = jnp.where(hop > 1, NUM_BOND_TYPES + hop - 1, 0)
    return type_mat.astype(jnp.int32) + type_high


def extend_ts_graph(
    bond_mat: jax.Array, node_mask: jax.Array, order: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Order-extended condensed R/P local graph.

    Dense form of ``_extend_ts_graph_order`` (reference models/common.py:115-202).

    Args:
      bond_mat: (B, N, N) int condensed types ``r*22 + p`` (0 = no bond).
      node_mask: (B, N) bool.
      order: extension order (production: 4 for encoding, 3 for the output
        head — reference configs/train_config.yml:8-9).
    Returns:
      (mask_local, type_r, type_p): (B,N,N) bool / int32 / int32.  An edge is
      local iff either side has a (possibly higher-order) edge; each side's
      type is 0 where that side has none (the reference's -1 placeholder
      clamped to 0 at models/common.py:186-192).
    """
    pm = pair_mask(node_mask)
    type_mat_r = jnp.where(pm, bond_mat // NUM_BOND_TYPES, 0)
    type_mat_p = jnp.where(pm, bond_mat % NUM_BOND_TYPES, 0)

    type_r = _typed_higher_order(type_mat_r, order)
    type_p = _typed_higher_order(type_mat_p, order)

    mask_local = ((type_r > 0) | (type_p > 0)) & pm
    type_r = jnp.where(mask_local, type_r, 0)
    type_p = jnp.where(mask_local, type_p, 0)
    return mask_local, type_r, type_p


def radius_edge_mask(
    pos: jax.Array, node_mask: jax.Array, cutoff: float
) -> jax.Array:
    """All intra-graph pairs with distance <= cutoff (no self loops).

    Dense replacement for ``torch_cluster.radius_graph`` (reference
    models/common.py:344).  No neighbor-count truncation: the reference
    relies on radius_graph's default max_num_neighbors=32 never binding for
    these small molecules; the dense mask has no such cap at all.
    """
    diff = pos[:, :, None, :] - pos[:, None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)
    return (sq <= cutoff * cutoff) & pair_mask(node_mask)


@partial(jax.jit, static_argnames=("order", "cutoff"))
def extend_condensed_graph_edge(
    bond_mat: jax.Array,
    pos: jax.Array,
    node_mask: jax.Array,
    order: int,
    cutoff: float,
) -> GraphEdges:
    """Full production edge construction for the condensed TS model.

    Equivalent to ``extend_ts_graph_order_radius`` (reference
    models/common.py:205-223) followed by the dense recomposition in
    ``_extend_condensed_graph_edge`` (reference models/epsnet/condensenc.py:
    136-152), whose net effect is: the global edge set is local ∪ radius and
    each global edge carries the local ``type_r``/``type_p`` (0 if none).

    Called inside every forward pass — i.e. at all 5000 sampling steps on the
    moving coordinates — so it must be cheap and shape-stable: here it is a
    handful of (B, N, N) matmuls and masks fused into the surrounding jit.
    """
    mask_local, type_r, type_p = extend_ts_graph(bond_mat, node_mask, order)
    mask_radius = radius_edge_mask(pos, node_mask, cutoff)
    mask_global = mask_local | mask_radius
    return GraphEdges(
        mask_global=mask_global,
        mask_local=mask_local,
        type_r=type_r,
        type_p=type_p,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StaticPairs:
    """Position-INDEPENDENT pair structures, hoistable out of the sampling loop.

    The typed higher-order extension depends only on the 2D bond graph; only
    the radius mask involves coordinates.  The reference rebuilds everything
    from scratch inside every forward (all 5000 steps x 8 members,
    reference condensenc.py:201-206) — here the adjacency matmuls run ONCE
    per batch and each scan step only thresholds a distance matrix.

    ``*_in`` is the encoder edge set (``edge_order``); ``*_out`` the output
    head's (``pred_edge_order``).  With equal orders they alias.
    """

    mask_local_in: jax.Array
    type_r_in: jax.Array
    type_p_in: jax.Array
    mask_local_out: jax.Array
    type_r_out: jax.Array
    type_p_out: jax.Array


def precompute_static_pairs(
    bond_mat: jax.Array,
    node_mask: jax.Array,
    edge_order: int,
    pred_edge_order: int,
) -> StaticPairs:
    m_in, tr_in, tp_in = extend_ts_graph(bond_mat, node_mask, edge_order)
    if pred_edge_order == edge_order:
        m_out, tr_out, tp_out = m_in, tr_in, tp_in
    else:
        m_out, tr_out, tp_out = extend_ts_graph(bond_mat, node_mask, pred_edge_order)
    return StaticPairs(m_in, tr_in, tp_in, m_out, tr_out, tp_out)


def extend_graph_order(
    type_mat: jax.Array, node_mask: jax.Array, order: int
) -> tuple[jax.Array, jax.Array]:
    """GeoDiff-legacy single-graph order extension (dense).

    Mirrors ``_extend_graph_order`` (reference models/common.py:255-325):
    k-hop (k>=2) edges get type ``NUM_BOND_TYPES**2 + k - 1`` (note the
    squared offset — the legacy path keeps the condensed code as-is on
    bonds and offsets high-order types past the full condensed vocab,
    reference models/common.py:303-305).
    """
    pm = pair_mask(node_mask)
    type_mat = jnp.where(pm, type_mat, 0).astype(jnp.int32)
    adj = type_mat > 0
    hop = higher_order_adj(adj, order)
    type_high = jnp.where(hop > 1, NUM_BOND_TYPES**2 + hop - 1, 0)
    type_new = type_mat + type_high
    return (type_new > 0) & pm, type_new


def extend_graph_order_radius(
    type_mat: jax.Array,
    pos: jax.Array,
    node_mask: jax.Array,
    order: int,
    cutoff: float,
    extend_order: bool = True,
    extend_radius: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Legacy composition (reference models/common.py:387-417): order-extended
    edges unioned with the radius graph; radius-only edges get type 0."""
    pm = pair_mask(node_mask)
    if extend_order:
        mask, types = extend_graph_order(type_mat, node_mask, order)
    else:
        types = jnp.where(pm, type_mat, 0).astype(jnp.int32)
        mask = types > 0
    if extend_radius:
        mask = mask | radius_edge_mask(pos, node_mask, cutoff)
        types = jnp.where(mask, types, 0)
    return mask, types
