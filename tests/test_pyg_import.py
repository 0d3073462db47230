"""PyG-free import of reference artifacts (data/pyg_compat.py).

The reference persists datasets/samples as plain pickles of
torch_geometric Data (often with embedded rdkit Mols); neither package is
installed here.  These tests cover the stub-unpickle path on synthetic
fixtures, and — when the read-only reference checkout is present — on the
REAL trained-model artifact it ships (birkholz rxn_0 samples + the
production feat_dict), the only real-RDKit-featurized data available in
this environment.
"""

import os
import pickle

import numpy as np
import pytest

from tsdiff_tpu.data.dataset import load_dataset
from tsdiff_tpu.data.pyg_compat import (
    StubData,
    data_attrs,
    install_pyg_stubs,
    load_pyg_pickle,
    uninstall_pyg_stubs,
)

REF_SAMPLES = "/root/reference/birkholz_benchmark/rxn_0/samples_all.pkl"
REF_FEAT_DICT = "/root/reference/data/TS/wb97xd3/feat_dict.pkl"


def _fake_pyg_pickle(path, n_graphs=3, with_store=False):
    """Write a pickle whose payload pickles AS ``torch_geometric.data.data
    .Data`` (StubData claims that identity), then UNINSTALL the stubs — so
    loading it exercises the exact path real reference pickles take: plain
    unpickle fails with ModuleNotFoundError, the retry installs the stubs,
    and the global resolves through the stub module wiring."""
    import torch

    install_pyg_stubs()
    rng = np.random.default_rng(0)
    data_list = []
    for i in range(n_graphs):
        n = 4 + i
        fields = dict(
            atom_type=torch.tensor([6] * n),
            r_feat=torch.tensor(rng.integers(0, 2, (n, 25))),
            p_feat=torch.tensor(rng.integers(0, 2, (n, 25))),
            pos=torch.tensor(rng.normal(size=(n, 3)).astype(np.float32)),
            edge_index=torch.tensor([[0, 1], [1, 0]]),
            edge_type=torch.tensor([23, 23]),
            smiles=f"mol{i}",
        )
        d = StubData()
        if with_store:
            # new-style PyG: fields live in a _store with a _mapping
            from tsdiff_tpu.data.pyg_compat import StubStorage

            s = StubStorage()
            s._mapping = fields
            d._store = s
        else:
            d.__dict__.update(fields)
        data_list.append(d)
    with open(path, "wb") as f:
        pickle.dump(data_list, f)
    uninstall_pyg_stubs()


def test_stub_unpickle_and_load_dataset(tmp_path):
    p = tmp_path / "pyg.pkl"
    _fake_pyg_pickle(str(p))
    # load_dataset auto-converts PyG lists in memory
    graphs, feat_dict = load_dataset(str(p))
    assert len(graphs) == 3
    g = graphs[0]
    assert g["atom_type"].dtype == np.int32 and g["atom_type"].shape == (4,)
    assert g["r_feat"].dtype == np.float32 and g["r_feat"].shape == (4, 25)
    assert g["edge_index"].shape == (2, 2)
    assert g["smiles"] == "mol0"


def test_stub_unpickle_new_style_store(tmp_path):
    p = tmp_path / "pyg2.pkl"
    _fake_pyg_pickle(str(p), with_store=True)
    data_list = load_pyg_pickle(str(p))
    a = data_attrs(data_list[0])
    assert "atom_type" in a and "r_feat" in a
    graphs, _ = load_dataset(str(p))
    assert len(graphs) == 3 and graphs[1]["pos"].shape == (5, 3)


def test_convert_cli_roundtrip(tmp_path):
    from tsdiff_tpu.data import convert

    src = tmp_path / "pyg.pkl"
    dst = tmp_path / "native.pkl"
    _fake_pyg_pickle(str(src))
    convert.main(["dataset", str(src), str(dst)])
    graphs, _ = load_dataset(str(dst))
    assert len(graphs) == 3
    assert graphs[2]["p_feat"].shape == (6, 25)


def test_stubs_do_not_shadow_real_modules():
    installed = install_pyg_stubs()
    # idempotent: second call installs nothing new
    assert install_pyg_stubs() == []
    # stubs never claim a module that imports for real
    for name in installed:
        import sys

        assert getattr(sys.modules[name], "__tsdiff_tpu_stub__", False)
    uninstall_pyg_stubs()


def test_stubs_are_transient_and_do_not_poison_probes(tmp_path):
    """load_pyg_pickle must remove the stand-in modules afterwards, and a
    lingering stub must never convince availability probes that rdkit is
    installed (it would break the gated featurization/clustering paths)."""
    import sys

    from tsdiff_tpu.chem import have_rdkit

    before = have_rdkit()
    p = tmp_path / "pyg.pkl"
    _fake_pyg_pickle(str(p), n_graphs=1)
    assert "rdkit" not in sys.modules or not getattr(
        sys.modules["rdkit"], "__tsdiff_tpu_stub__", False
    )
    load_pyg_pickle(str(p))
    # stubs uninstalled after the load; probe unchanged
    assert not getattr(sys.modules.get("rdkit"), "__tsdiff_tpu_stub__", False)
    assert have_rdkit() == before
    # even WITH stubs force-installed, the probe rejects the stand-in
    installed = install_pyg_stubs()
    try:
        if any(n == "rdkit" for n in installed):
            assert have_rdkit() is False
    finally:
        uninstall_pyg_stubs()


def test_non_dataset_pickle_still_rejected(tmp_path):
    p = tmp_path / "junk.pkl"
    with open(p, "wb") as f:
        pickle.dump({"not": "a dataset"}, f)
    with pytest.raises(ValueError, match="not a tsdiff_tpu"):
        load_dataset(str(p))


def test_evaluate_cli_accepts_pyg_samples(tmp_path, capsys):
    """The evaluate CLI scores reference-format PyG sample pickles directly
    (pos_gen vs pos under automorphism-matched D-MAE)."""
    import torch

    from tsdiff_tpu.cli import evaluate as evaluate_cli

    install_pyg_stubs()
    rng = np.random.default_rng(3)
    data_list = []
    for _ in range(2):
        pos = rng.normal(size=(5, 3)).astype(np.float32)
        d = StubData()
        d.__dict__.update(
            atom_type=torch.tensor([6, 6, 1, 1, 1]),
            r_feat=torch.tensor(rng.integers(0, 2, (5, 25))),
            p_feat=torch.tensor(rng.integers(0, 2, (5, 25))),
            pos=torch.tensor(pos),
            pos_gen=torch.tensor(pos + rng.normal(scale=0.05, size=(5, 3)).astype(np.float32)),
            edge_index=torch.tensor([[0, 1], [1, 0]]),
            edge_type=torch.tensor([23, 23]),
        )
        data_list.append(d)
    p = tmp_path / "ref_samples.pkl"
    with open(p, "wb") as f:
        pickle.dump(data_list, f)
    uninstall_pyg_stubs()
    evaluate_cli.main(["--samples", str(p)])
    out = capsys.readouterr().out
    assert "2 samples evaluated" in out and "D-MAE" in out


@pytest.mark.skipif(
    not os.path.exists(REF_SAMPLES), reason="reference checkout not present"
)
def test_real_reference_samples_convert():
    """The trained reference model's actual sampling output (100 ddpm
    samples of birkholz rxn_0, written by reference sampling.py with real
    RDKit featurization) converts losslessly and matches our wire format."""
    graphs, _ = load_dataset(REF_SAMPLES)
    assert len(graphs) == 100
    g = graphs[0]
    n = g["atom_type"].shape[0]
    assert n == 13
    # real production featurization: one-hot width 25
    assert g["r_feat"].shape == (n, 25) and g["p_feat"].shape == (n, 25)
    assert set(np.unique(g["r_feat"])) <= {0.0, 1.0}
    # condensed edge encoding r*22+p stays within our uint8 wire format
    assert g["edge_type"].max() < 256 and g["edge_type"].min() >= 0
    assert g["edge_index"].shape[0] == 2
    # generated geometries differ per repeat; the graph does not
    assert not np.allclose(graphs[0]["pos_gen"], graphs[1]["pos_gen"])
    assert np.array_equal(graphs[0]["edge_type"], graphs[99]["edge_type"])

    # our batching path accepts the real featurized graph unchanged
    from tsdiff_tpu.data.dataset import PaddedBatchLoader, TSDataset

    loader = PaddedBatchLoader(
        TSDataset(graphs[:4]), batch_size=4, bucket_sizes=[16], shuffle=False
    )
    batch = next(iter(loader))
    assert batch.node_mask.sum() == 4 * n


@pytest.mark.skipif(
    not os.path.exists(REF_FEAT_DICT), reason="reference checkout not present"
)
def test_real_feat_dict_layout_parity():
    """The production feat_dict's one-hot layout sums to exactly the
    feat_dim the production config declares (25) and is consumable by our
    one_hot_features (reference preprocessing.py:152-164)."""
    import torch  # noqa: F401  (tensor-free pickle, but keep import order)

    install_pyg_stubs()
    try:
        with open(REF_FEAT_DICT, "rb") as f:
            fd = pickle.load(f)
    finally:
        uninstall_pyg_stubs()
    widths = {k: len(v) for k, v in fd.items()}
    assert sum(widths.values()) == 25
    # same getter set our featurizer emits, in the reference's order
    assert list(widths) == [
        "GetIsAromatic", "GetFormalCharge", "GetHybridization",
        "GetTotalNumHs", "GetTotalValence", "GetTotalDegree",
        "GetChiralTag", "IsInRing",
    ]
    # index codes are dense per getter
    for k, v in fd.items():
        assert sorted(v.values()) == list(range(len(v))), k

    from tsdiff_tpu.data.featurize import one_hot_features

    # a graph holding per-getter integer codes expands to width 25
    g = {
        "r_feat": np.zeros((2, len(widths)), dtype=np.int64),
        "p_feat": np.zeros((2, len(widths)), dtype=np.int64),
    }
    out = one_hot_features([g], fd)[0]
    assert out["r_feat"].shape == (2, 25)
    assert np.all(out["r_feat"].sum(axis=1) == len(widths))
