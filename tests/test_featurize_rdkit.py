"""RDKit featurization tests — active only where RDKit is installed.

(The build environment lacks RDKit; these gate-checked tests document the
contract and run in user environments.)
"""

import numpy as np
import pytest

from tsdiff_tpu.chem import NUM_BOND_TYPES, have_rdkit

pytestmark = pytest.mark.skipif(not have_rdkit(), reason="RDKit not installed")


def test_generate_ts_data_simple_reaction():
    from tsdiff_tpu.data.featurize import default_feat_dict, generate_ts_data

    # atom-mapped H2 + O -> H2O-like toy SMARTS
    r = "[H:1][H:2].[O:3]"
    p = "[H:1][O:3][H:2]"
    g, feat_dict = generate_ts_data(r, p, None, default_feat_dict())
    assert g["atom_type"].tolist() == [1, 1, 8]
    n = 3
    bond = np.zeros((n, n), np.int64)
    bond[g["edge_index"][0], g["edge_index"][1]] = g["edge_type"]
    # R has H1-H2 bond (r=1), P doesn't (p=0): condensed 1*22+0
    assert bond[0, 1] == 1 * NUM_BOND_TYPES + 0
    # P has H1-O3 and H2-O3 single bonds, R doesn't: condensed 0*22+1
    assert bond[0, 2] == 1
    assert bond[1, 2] == 1
    assert (bond == bond.T).all()


def test_featurize_smarts_list_one_hot():
    from tsdiff_tpu.data.featurize import default_feat_dict, featurize_smarts_list

    graphs = featurize_smarts_list(["[H:1][H:2].[O:3]>>[H:1][O:3][H:2]"], default_feat_dict())
    g = graphs[0]
    assert g["r_feat"].ndim == 2 and g["r_feat"].shape[0] == 3
    assert set(np.unique(g["r_feat"])) <= {0.0, 1.0}
