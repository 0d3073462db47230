"""Pure-numpy mirror of the reference's sparse graph-construction semantics.

Used as the test oracle for the dense TPU implementations.  Re-derived from
the documented behavior of reference models/common.py / condensenc.py (NOT a
code copy — this operates on plain numpy adjacency matrices and edge lists).
"""

from __future__ import annotations

import numpy as np

NUM_BOND_TYPES = 22


def binarize(x):
    return (x > 0).astype(np.int64)


def higher_order_adj_np(adj: np.ndarray, order: int) -> np.ndarray:
    """Hop-count matrix (reference models/common.py:119-143 semantics)."""
    n = adj.shape[0]
    eye = np.eye(n, dtype=np.int64)
    mats = [eye, binarize(adj + eye)]
    for _ in range(2, order + 1):
        mats.append(binarize(mats[-1] @ mats[1]))
    order_mat = np.zeros_like(eye)
    for k in range(1, order + 1):
        order_mat += (mats[k] - mats[k - 1]) * k
    return order_mat


def extend_ts_graph_np(bond_mat: np.ndarray, order: int):
    """Sparse-semantics mirror of _extend_ts_graph_order on one graph.

    Returns (edge_set, type_r, type_p) as dicts keyed by (i, j) directed pairs.
    """
    tr = bond_mat // NUM_BOND_TYPES
    tp = bond_mat % NUM_BOND_TYPES

    out = {}
    for t_mat in (tr, tp):
        adj = binarize(t_mat)
        hop = higher_order_adj_np(adj, order)
        t_high = np.where(hop > 1, NUM_BOND_TYPES + hop - 1, 0)
        assert (t_mat * t_high == 0).all()
        out[id(t_mat)] = t_mat + t_high
    type_new_r = out[id(tr)]
    type_new_p = out[id(tp)]

    # union edge set: either side nonzero; per-side types (0 where absent)
    edge_mask = (type_new_r != 0) | (type_new_p != 0)
    edges = {}
    for i, j in zip(*np.nonzero(edge_mask)):
        edges[(int(i), int(j))] = (int(type_new_r[i, j]), int(type_new_p[i, j]))
    return edges


def radius_edges_np(pos: np.ndarray, cutoff: float):
    n = pos.shape[0]
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    out = set()
    for i in range(n):
        for j in range(n):
            if i != j and d[i, j] <= cutoff:
                out.add((i, j))
    return out


def condensed_global_edges_np(bond_mat: np.ndarray, pos: np.ndarray, order: int, cutoff: float):
    """Mirror of _extend_condensed_graph_edge's net result: global edge set =
    local ∪ radius; types = local types where local else 0."""
    local = extend_ts_graph_np(bond_mat, order)
    radius = radius_edges_np(pos, cutoff)
    all_edges = set(local.keys()) | radius
    return {e: local.get(e, (0, 0)) for e in all_edges}


def eq_transform_np(score_d: dict, pos: np.ndarray, edges):
    """scatter-add mirror of reference models/geometry.py:22-30 over an edge list."""
    n = pos.shape[0]
    out = np.zeros((n, 3))
    for (i, j) in edges:
        d = np.linalg.norm(pos[i] - pos[j])
        dd_dr = (pos[i] - pos[j]) / d
        s = score_d[(i, j)]
        out[i] += dd_dr * s
        out[j] -= dd_dr * s
    return out


def random_reaction_graph(rng: np.random.Generator, n: int):
    """A random plausible condensed reaction graph: symmetric R and P bond
    graphs on n atoms with types in 1..3, some bonds broken/formed."""
    def random_sym_bonds(p_edge=0.25):
        t = np.zeros((n, n), dtype=np.int64)
        for i in range(n):
            for j in range(i + 1, n):
                if rng.random() < p_edge:
                    bt = int(rng.integers(1, 4))
                    t[i, j] = t[j, i] = bt
        return t

    tr = random_sym_bonds()
    tp = tr.copy()
    # break and form a few bonds in P
    for i in range(n):
        for j in range(i + 1, n):
            r = rng.random()
            if tp[i, j] and r < 0.3:
                tp[i, j] = tp[j, i] = 0
            elif not tp[i, j] and r < 0.1:
                bt = int(rng.integers(1, 4))
                tp[i, j] = tp[j, i] = bt
    return tr * NUM_BOND_TYPES + tp
