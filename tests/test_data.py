"""Data layer: format round-trip, bucketing, padding, splits."""

import numpy as np
import pytest

from tsdiff_tpu.data import (
    PaddedBatchLoader,
    TSDataset,
    default_buckets,
    index_split,
    load_dataset,
    one_hot_features,
    random_split,
    save_dataset,
)

from reference_numpy import random_reaction_graph


def make_graph_dicts(rng, sizes, feat_dim=6):
    out = []
    for n in sizes:
        bm = random_reaction_graph(rng, n)
        ei = np.stack(np.nonzero(bm)).astype(np.int32)
        out.append(
            dict(
                atom_type=rng.integers(1, 10, size=n).astype(np.int32),
                r_feat=(rng.random((n, feat_dim)) < 0.3).astype(np.float32),
                p_feat=(rng.random((n, feat_dim)) < 0.3).astype(np.float32),
                pos=rng.normal(size=(n, 3)).astype(np.float32),
                edge_index=ei,
                edge_type=bm[ei[0], ei[1]].astype(np.int32),
                smiles=f"mol{n}",
            )
        )
    return out


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    graphs = make_graph_dicts(rng, [4, 6])
    p = str(tmp_path / "ds.pkl")
    save_dataset(p, graphs, feat_dict={"a": {0: 0}})
    loaded, fd = load_dataset(p)
    assert len(loaded) == 2
    assert fd == {"a": {0: 0}}
    np.testing.assert_array_equal(loaded[0]["atom_type"], graphs[0]["atom_type"])


def test_bucketing_and_padding():
    rng = np.random.default_rng(1)
    ds = TSDataset(make_graph_dicts(rng, [3, 5, 9, 12, 15, 4]))
    assert default_buckets(15) == [8, 16]
    loader = PaddedBatchLoader(ds, batch_size=2, shuffle=False, with_indices=True)
    seen = set()
    for batch, idxs in loader:
        B, N = batch.atom_type.shape
        assert B == 2
        assert N in (8, 16)
        nn = np.asarray(batch.num_nodes)
        for k, i in enumerate(idxs):
            if i >= 0:
                seen.add(int(i))
                assert nn[k] == ds[int(i)]["atom_type"].shape[0]
            else:
                assert nn[k] == 0  # padding graph
        # bond_mat equals the sparse edges densified
        bm = np.asarray(batch.bond_mat)
        for k, i in enumerate(idxs):
            if i < 0:
                continue
            g = ds[int(i)]
            want = np.zeros((N, N), np.int32)
            want[g["edge_index"][0], g["edge_index"][1]] = g["edge_type"]
            np.testing.assert_array_equal(bm[k], want)
    assert seen == set(range(6))


def test_loader_len_and_shuffle_determinism():
    rng = np.random.default_rng(2)
    ds = TSDataset(make_graph_dicts(rng, [5] * 7))
    loader = PaddedBatchLoader(ds, batch_size=3, shuffle=True, seed=0, with_indices=True)
    n1 = [tuple(i) for _, i in loader]
    assert len(n1) == 3  # ceil(7/3)


def test_one_hot_features():
    rng = np.random.default_rng(3)
    feat_dict = {"g1": {0: 0, 1: 1}, "g2": {0: 0, 1: 1, 2: 2}}
    g = dict(
        r_feat=np.array([[0, 2], [1, 0]], dtype=np.int32),
        p_feat=np.array([[1, 1], [0, 2]], dtype=np.int32),
    )
    [g2] = one_hot_features([g], feat_dict)
    assert g2["r_feat"].shape == (2, 5)
    np.testing.assert_array_equal(g2["r_feat"][0], [1, 0, 0, 0, 1])
    np.testing.assert_array_equal(g2["p_feat"][1], [1, 0, 0, 0, 1])


def test_index_split_pairs_kept_together():
    tr, va, te = index_split(100, train=0.8, valid=0.1, seed=42)
    assert len(tr) == 160 and len(va) == 20 and len(te) == 20
    for split in (tr, va, te):
        ks = set(i // 2 for i in split)
        for k in ks:
            assert 2 * k in split and 2 * k + 1 in split
    assert set(tr) | set(va) | set(te) == set(range(200))
    # deterministic under the fixed seed
    tr2, _, _ = index_split(100, train=0.8, valid=0.1, seed=42)
    assert tr == tr2


def test_random_split():
    tr, va, te = random_split(list(range(50)), 0.8, 0.1, seed=7)
    assert len(tr) == 40 and len(va) == 5 and len(te) == 5
    assert set(tr) | set(va) | set(te) == set(range(50))
