"""GeoDiff-legacy conformer data pipeline (capability of reference
utils/datasets.py:31-385, 1102-1342).

Supports the dual-encoder model family: single-molecule conformer graphs
(no R/P condensation) from RDKit mols with one conformer each, plus dataset
classes mirroring ``ConformationDataset`` / ``PackedConformationDataset``.
RDKit is required only for featurizing raw molecules; pre-featurized
tsdiff_tpu pickles load without it.

Legacy graph dicts carry ``r_feat``/``p_feat`` as empty (feat_dim 0)
placeholders so the same padded-batch machinery applies; edge types are the
plain bond codes (the dualenc path's non-TS decomposition,
tsdiff_tpu/models/dualenc.py).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from tsdiff_tpu.chem import BOND_TYPES  # noqa: F401 (documented vocabulary)
from tsdiff_tpu.data.dataset import TSDataset


def rdmol_to_data(mol, smiles: str | None = None) -> dict:
    """RDKit Mol (1 conformer) -> legacy graph dict
    (reference utils/datasets.py:331-385)."""
    from rdkit import Chem

    assert mol.GetNumConformers() == 1
    n = mol.GetNumAtoms()
    pos = np.asarray(mol.GetConformer(0).GetPositions(), dtype=np.float32)
    z = np.array([a.GetAtomicNum() for a in mol.GetAtoms()], dtype=np.int32)

    row, col, etype = [], [], []
    for bond in mol.GetBonds():
        s, e = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
        code = int(bond.GetBondType())
        row += [s, e]
        col += [e, s]
        etype += [code, code]
    edge_index = np.array([row, col], dtype=np.int32)
    etype = np.array(etype, dtype=np.int32)
    perm = np.argsort(edge_index[0] * n + edge_index[1], kind="stable")
    edge_index = edge_index[:, perm]
    etype = etype[perm]

    return dict(
        atom_type=z,
        r_feat=np.zeros((n, 0), np.float32),
        p_feat=np.zeros((n, 0), np.float32),
        pos=pos,
        edge_index=edge_index,
        edge_type=etype,
        smiles=smiles if smiles is not None else Chem.MolToSmiles(mol),
    )


def preprocess_geom_dataset(
    base_path: str,
    dataset_name: str,
    max_conf: int = 5,
    train_size: float = 0.8,
    max_size: int = 2**62,
    seed: int | None = None,
):
    """GEOM (qm9/drugs) conformer extraction (reference utils/datasets.py:
    681-796): read the summary json, take the ``max_conf`` highest-Boltzmann-
    weight conformers per molecule, split by 2D structure (molecule-level)
    into train/val/test.  Requires RDKit."""
    import json
    import os
    import pickle as pkl
    import random

    seed = 2021 if seed is None else seed
    np.random.seed(seed)
    random.seed(seed)

    assert dataset_name in ("qm9", "drugs")
    with open(os.path.join(base_path, f"summary_{dataset_name}.json")) as f:
        summ = json.load(f)

    pickle_paths = []
    for smiles, meta in summ.items():
        if meta.get("uniqueconfs") is None or meta.get("pickle_path") is None:
            continue
        pickle_paths.append(meta["pickle_path"])
        if len(pickle_paths) >= max_size:
            break

    train, val, test = [], [], []
    val_size = (1.0 - train_size) / 2
    bad = 0
    for rel in pickle_paths:
        with open(os.path.join(base_path, rel), "rb") as f:
            mol = pkl.load(f)
        u = mol.get("uniqueconfs")
        confs = mol.get("conformers")
        if u is None or u <= 0 or u > len(confs):
            bad += 1
            continue
        if u <= max_conf:
            conf_ids = np.arange(u)
        else:
            weights = np.array([c.get("boltzmannweight", -1.0) for c in confs])
            conf_ids = (-weights).argsort()[:max_conf]
        datas = []
        for cid in conf_ids:
            meta = confs[int(cid)]
            g = rdmol_to_data(meta["rd_mol"])
            g["totalenergy"] = float(meta.get("totalenergy", 0.0))
            g["boltzmannweight"] = float(meta.get("boltzmannweight", 0.0))
            datas.append(g)
        eps = np.random.rand()
        if eps <= train_size:
            train.extend(datas)
        elif eps <= train_size + val_size:
            val.extend(datas)
        else:
            test.extend(datas)
    return train, val, test


def preprocess_iso17_dataset(base_path: str):
    """ISO17 conformer pickles -> legacy graph dicts
    (reference utils/datasets.py:642-678).  Requires RDKit to featurize the
    pickled mols (torch-free unpickling is the caller's concern)."""
    import os
    import pickle as pkl

    out = []
    for split in ("train", "test"):
        with open(os.path.join(base_path, f"iso17_split-0_{split}.pkl"), "rb") as f:
            raw = pkl.load(f)
        out.append([rdmol_to_data(m) for m in raw])
    return tuple(out)


class ConformationDataset(TSDataset):
    """Legacy conformer dataset with atom/edge-type vocab discovery
    (reference utils/datasets.py:1102-1133)."""

    def __init__(self, path_or_graphs):
        super().__init__(path_or_graphs)
        self.atom_types = sorted(
            {int(t) for g in self.graphs for t in np.asarray(g["atom_type"]).tolist()}
        )
        self.edge_types = sorted(
            {int(t) for g in self.graphs for t in np.asarray(g["edge_type"]).tolist()}
        )


class PackedConformationDataset(ConformationDataset):
    """Groups multiple conformers of the same molecule
    (reference utils/datasets.py:1292-1342): each item is one molecule with
    ``pos_ref`` stacking all its conformers — the input format of the
    COV/MAT evaluator."""

    def __init__(self, path_or_graphs):
        super().__init__(path_or_graphs)
        by_smiles: dict[str, list[dict]] = defaultdict(list)
        for g in self.graphs:
            by_smiles[g.get("smiles", "")].append(g)
        packed = []
        for smiles, graphs in by_smiles.items():
            base = dict(graphs[0])
            base["pos_ref"] = np.stack([np.asarray(g["pos"]) for g in graphs])
            base["num_pos_ref"] = len(graphs)
            packed.append(base)
        self.graphs = packed
