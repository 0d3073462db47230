"""Dense graph construction vs. the numpy sparse-semantics oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from tsdiff_tpu.core import graph_ops
from tsdiff_tpu.chem import NUM_BOND_TYPES

from reference_numpy import (
    condensed_global_edges_np,
    extend_ts_graph_np,
    higher_order_adj_np,
    random_reaction_graph,
)


def _pad_batch(bond_mats, poss, n_pad):
    B = len(bond_mats)
    bm = np.zeros((B, n_pad, n_pad), dtype=np.int32)
    pos = np.zeros((B, n_pad, 3), dtype=np.float32)
    mask = np.zeros((B, n_pad), dtype=bool)
    for b, (t, p) in enumerate(zip(bond_mats, poss)):
        n = t.shape[0]
        bm[b, :n, :n] = t
        pos[b, :n] = p
        mask[b, :n] = True
    return jnp.asarray(bm), jnp.asarray(pos), jnp.asarray(mask)


def test_higher_order_adj_matches_oracle():
    rng = np.random.default_rng(0)
    for n in (4, 7, 12):
        adj = (rng.random((n, n)) < 0.3)
        adj = np.triu(adj, 1)
        adj = (adj | adj.T).astype(np.int64)
        for order in (2, 3, 4):
            want = higher_order_adj_np(adj, order)
            got = graph_ops.higher_order_adj(jnp.asarray(adj)[None], order)[0]
            np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("order", [3, 4])
def test_extend_ts_graph_matches_oracle(order):
    rng = np.random.default_rng(1)
    sizes = [5, 9, 14]
    bms = [random_reaction_graph(rng, n) for n in sizes]
    poss = [rng.normal(size=(n, 3)) for n in sizes]
    bm, pos, mask = _pad_batch(bms, poss, n_pad=16)

    mask_local, type_r, type_p = graph_ops.extend_ts_graph(bm, mask, order)
    mask_local, type_r, type_p = map(np.asarray, (mask_local, type_r, type_p))

    for b, t in enumerate(bms):
        want = extend_ts_graph_np(t, order)
        got_edges = {
            (int(i), int(j)): (int(type_r[b, i, j]), int(type_p[b, i, j]))
            for i, j in zip(*np.nonzero(mask_local[b]))
        }
        assert got_edges == want


@pytest.mark.parametrize("order,cutoff", [(4, 10.0), (3, 10.0), (4, 2.5)])
def test_condensed_global_edges_match_oracle(order, cutoff):
    rng = np.random.default_rng(2)
    sizes = [6, 11, 16]
    bms = [random_reaction_graph(rng, n) for n in sizes]
    poss = [rng.normal(scale=2.0, size=(n, 3)) for n in sizes]
    bm, pos, mask = _pad_batch(bms, poss, n_pad=16)

    edges = graph_ops.extend_condensed_graph_edge(bm, pos, mask, order=order, cutoff=cutoff)
    mg = np.asarray(edges.mask_global)
    tr = np.asarray(edges.type_r)
    tp = np.asarray(edges.type_p)

    for b, (t, p) in enumerate(zip(bms, poss)):
        want = condensed_global_edges_np(t, p, order, cutoff)
        got = {
            (int(i), int(j)): (int(tr[b, i, j]), int(tp[b, i, j]))
            for i, j in zip(*np.nonzero(mg[b]))
        }
        assert got == want


def test_padded_nodes_produce_no_edges():
    rng = np.random.default_rng(3)
    t = random_reaction_graph(rng, 6)
    p = rng.normal(size=(6, 3))
    bm, pos, mask = _pad_batch([t], [p], n_pad=12)
    edges = graph_ops.extend_condensed_graph_edge(bm, pos, mask, order=4, cutoff=1000.0)
    mg = np.asarray(edges.mask_global)[0]
    assert not mg[6:, :].any()
    assert not mg[:, 6:].any()
    assert not np.diag(mg).any()


def test_high_order_type_codes():
    # chain 0-1-2-3-4 single bonds, same in R and P
    n = 5
    t = np.zeros((n, n), dtype=np.int64)
    for i in range(4):
        t[i, i + 1] = t[i + 1, i] = 1 * NUM_BOND_TYPES + 1  # single/single
    bm, pos, mask = _pad_batch([t], [np.zeros((n, 3))], n_pad=8)
    mask_local, type_r, _ = graph_ops.extend_ts_graph(bm, mask, order=4)
    type_r = np.asarray(type_r)[0]
    assert type_r[0, 1] == 1          # direct bond
    assert type_r[0, 2] == NUM_BOND_TYPES + 1   # 2-hop = 23
    assert type_r[0, 3] == NUM_BOND_TYPES + 2   # 3-hop = 24
    assert type_r[0, 4] == NUM_BOND_TYPES + 3   # 4-hop = 25


def test_legacy_extend_graph_order_offsets():
    n = 4
    t = np.zeros((n, n), dtype=np.int64)
    t[0, 1] = t[1, 0] = 1
    t[1, 2] = t[2, 1] = 1
    bm = jnp.asarray(t[None].astype(np.int32))
    mask = jnp.ones((1, n), dtype=bool)
    emask, types = graph_ops.extend_graph_order(bm, mask, order=3)
    types = np.asarray(types)[0]
    assert types[0, 2] == NUM_BOND_TYPES**2 + 1  # legacy 2-hop offset past 22**2
