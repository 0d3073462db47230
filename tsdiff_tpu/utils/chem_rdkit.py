"""RDKit helper functions (import-gated; host-side only).

Equivalents of reference utils/chem.py: conformer position setters, best-RMSD,
SMILES helpers.  Everything here requires RDKit; the TPU compute path never
imports this module.
"""

from __future__ import annotations

from copy import deepcopy

import numpy as np


def set_rdmol_positions(rdkit_mol, pos):
    """Copy + set conformer coordinates (reference utils/chem.py:52-71)."""
    mol = deepcopy(rdkit_mol)
    conf = mol.GetConformer(0)
    for i in range(np.asarray(pos).shape[0]):
        conf.SetAtomPosition(i, [float(x) for x in pos[i]])
    return mol


def get_best_rmsd(probe, ref) -> float:
    """Heavy-atom best RMSD via RDKit (reference utils/chem.py:137-141)."""
    from rdkit.Chem import rdMolAlign as MA
    from rdkit.Chem.rdmolops import RemoveHs

    return float(MA.GetBestRMS(RemoveHs(probe), RemoveHs(ref)))


def mol_to_smiles(mol) -> str:
    from rdkit import Chem

    return Chem.MolToSmiles(mol, allHsExplicit=True)


def mol_to_smiles_without_hs(mol) -> str:
    from rdkit import Chem

    return Chem.MolToSmiles(Chem.RemoveHs(mol))


def get_atom_symbol(atomic_number: int) -> str:
    from rdkit.Chem import GetPeriodicTable

    return GetPeriodicTable().GetElementSymbol(int(atomic_number))
