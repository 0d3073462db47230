"""Native C++ batch packer vs the numpy fallback."""

import numpy as np
import pytest

from tsdiff_tpu.data.native import native_available, pack_batch_native

from test_data import make_graph_dicts


@pytest.mark.skipif(not native_available(), reason="native library unavailable")
def test_native_pack_matches_numpy():
    rng = np.random.default_rng(0)
    graphs = make_graph_dicts(rng, [4, 7, 9, 3])
    out = pack_batch_native(graphs, max_nodes=12)
    assert out is not None
    atom, rf, pf, pos, bond, mask = out

    B, N = 4, 12
    assert atom.shape == (B, N) and bond.shape == (B, N, N)
    for b, g in enumerate(graphs):
        n = g["atom_type"].shape[0]
        np.testing.assert_array_equal(atom[b, :n], g["atom_type"])
        assert (atom[b, n:] == 0).all()
        np.testing.assert_array_equal(rf[b, :n], g["r_feat"])
        np.testing.assert_array_equal(pos[b, :n], g["pos"])
        assert mask[b, :n].all() and not mask[b, n:].any()
        want = np.zeros((N, N), np.int32)
        want[g["edge_index"][0], g["edge_index"][1]] = g["edge_type"]
        np.testing.assert_array_equal(bond[b], want)


@pytest.mark.skipif(not native_available(), reason="native library unavailable")
def test_native_pack_rejects_oversized():
    rng = np.random.default_rng(1)
    graphs = make_graph_dicts(rng, [10])
    with pytest.raises(ValueError):
        pack_batch_native(graphs, max_nodes=6)


def test_from_numpy_graphs_same_with_and_without_native(monkeypatch):
    """ReactionBatch content identical whether or not the native path runs."""
    import tsdiff_tpu.data.native as native_mod
    from tsdiff_tpu.core.graph import from_numpy_graphs

    rng = np.random.default_rng(2)
    graphs = make_graph_dicts(rng, [5, 8])
    b1 = from_numpy_graphs(graphs, max_nodes=8)
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_lib_tried", True)
    b2 = from_numpy_graphs(graphs, max_nodes=8)
    for a, b in zip(
        (b1.atom_type, b1.r_feat, b1.p_feat, b1.pos, b1.bond_mat, b1.node_mask),
        (b2.atom_type, b2.r_feat, b2.p_feat, b2.pos, b2.bond_mat, b2.node_mask),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
