"""RDKit-free featurization fixtures: hand-verified graphs via duck-typed mols.

RDKit is absent in this environment (the two tests in test_featurize_rdkit.py
skip), so the atom-map alignment / union-adjacency / condensed-type logic of
``generate_ts_data`` (reference utils/datasets.py:407-519) is pinned here with
mock Mol/Atom/Bond objects and fully hand-computed expectations.  Only the
RDKit-API calls themselves (MolFromSmarts/Sanitize) remain RDKit-gated.
"""

import numpy as np

from tsdiff_tpu.chem import NUM_BOND_TYPES
from tsdiff_tpu.data.featurize import generate_ts_data, one_hot_features


class MockAtom:
    def __init__(self, map_num, z, aromatic, num_hs):
        self._m, self._z, self._ar, self._h = map_num, z, aromatic, num_hs

    def GetAtomMapNum(self):
        return self._m

    def GetAtomicNum(self):
        return self._z

    def GetIsAromatic(self):
        return self._ar

    def GetTotalNumHs(self):
        return self._h


class MockBond:
    def __init__(self, i, j, btype):
        self._i, self._j, self._t = i, j, btype

    def GetBeginAtomIdx(self):
        return self._i

    def GetEndAtomIdx(self):
        return self._j

    def GetBondType(self):
        return self._t


class MockMol:
    def __init__(self, atoms, bonds, smiles=""):
        self._atoms, self._bonds = atoms, bonds
        self.smiles = smiles

    def GetNumAtoms(self):
        return len(self._atoms)

    def GetAtoms(self):
        return list(self._atoms)

    def GetBonds(self):
        return list(self._bonds)

    def GetBondBetweenAtoms(self, i, j):
        for b in self._bonds:
            if {b.GetBeginAtomIdx(), b.GetEndAtomIdx()} == {i, j}:
                return b
        return None


def _reaction():
    """Hand-designed H-migration toy, 4 atoms (map space: C1, C2, O3, H4).

    R: C1-C2 (single), C2=O3 (double), O3-H4 (single); mol order [2,4,1,3].
    P: C1=C2 (double), C2-O3 (single), C1-H4 (single); mol order [3,1,4,2].
    Both mol atom orders are scrambled differently to exercise the
    atom-map permutation alignment (reference datasets.py:432-435).
    """
    # (map_num, z, aromatic, num_hs) in MAP order: C1 C2 O3 H4
    props = {1: (6, False, 1), 2: (6, False, 0), 3: (8, False, 1), 4: (1, False, 0)}

    def mol(order, bonds_map, smiles):
        atoms = [MockAtom(m, *props[m]) for m in order]
        idx_of_map = {m: i for i, m in enumerate(order)}
        bonds = [
            MockBond(idx_of_map[a], idx_of_map[b], t) for (a, b, t) in bonds_map
        ]
        return MockMol(atoms, bonds, smiles)

    r = mol([2, 4, 1, 3], [(1, 2, 1), (2, 3, 2), (3, 4, 1)], "R")
    p = mol([3, 1, 4, 2], [(1, 2, 2), (2, 3, 1), (1, 4, 1)], "P")
    return r, p


def test_generate_ts_data_hand_verified():
    r, p = _reaction()
    feat_dict = {"GetIsAromatic": {}, "GetTotalNumHs": {}}
    pos = np.arange(12, dtype=np.float64).reshape(4, 3)
    g, fd = generate_ts_data(r, p, xyz_block=pos, feat_dict=feat_dict)

    # atoms come out in MAP order regardless of either mol's scrambling
    np.testing.assert_array_equal(g["atom_type"], [6, 6, 8, 1])
    np.testing.assert_allclose(g["pos"], pos.astype(np.float32))

    # union edge set, sorted by row*n+col, both directions
    expected_edges = np.array(
        [[0, 0, 1, 1, 2, 2, 3, 3],
         [1, 3, 0, 2, 1, 3, 0, 2]], np.int32
    )
    np.testing.assert_array_equal(g["edge_index"], expected_edges)

    # condensed types r*22+p per unordered pair:
    #  (0,1): R single(1), P double(2) -> 1*22+2 = 24
    #  (0,3): R none(0),  P single(1) -> 1
    #  (1,2): R double(2), P single(1) -> 2*22+1 = 45
    #  (2,3): R single(1), P none(0)  -> 22
    np.testing.assert_array_equal(
        g["edge_type"], [24, 1, 24, 45, 45, 22, 1, 22]
    )
    assert NUM_BOND_TYPES == 22

    # feature vocab grows in map-order of first appearance:
    # aromatic: {False: 0}; num_hs: {1: 0, 0: 1}
    assert fd["GetIsAromatic"] == {False: 0}
    assert fd["GetTotalNumHs"] == {1: 0, 0: 1}
    np.testing.assert_array_equal(g["r_feat"], [[0, 0], [0, 1], [0, 0], [0, 1]])
    np.testing.assert_array_equal(g["p_feat"], [[0, 0], [0, 1], [0, 0], [0, 1]])
    assert g["smiles"] == "R>>P"


def test_one_hot_features_hand_verified():
    r, p = _reaction()
    feat_dict = {"GetIsAromatic": {}, "GetTotalNumHs": {}}
    g, fd = generate_ts_data(r, p, feat_dict=feat_dict)
    (g,) = one_hot_features([g], fd)
    # feat_dim = 1 (aromatic vocab) + 2 (num_hs vocab) = 3
    assert g["r_feat"].shape == (4, 3)
    np.testing.assert_array_equal(
        g["r_feat"],
        [[1, 1, 0], [1, 0, 1], [1, 1, 0], [1, 0, 1]],
    )


def test_atom_map_mismatch_raises():
    r, p = _reaction()
    # corrupt P: swap the atomic numbers of two atoms -> map inconsistency
    p._atoms[0]._z = 1
    try:
        generate_ts_data(r, p, feat_dict={"GetIsAromatic": {}})
        raise AssertionError("expected atom-map inconsistency assertion")
    except AssertionError as e:
        assert "atom-map" in str(e)
