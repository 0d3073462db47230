"""Chemistry constants and RDKit-gated helpers.

The reference derives its bond-type vocabulary from the RDKit BondType enum at
import time (reference utils/chem.py:21-22):

    BOND_TYPES = {t: i for i, t in enumerate(BT.names.values())}

Because enumeration order == enum value order, this is the identity map over
the 22 RDKit bond types.  We hardcode that vocabulary so the on-TPU framework
has zero RDKit dependency; RDKit is only needed host-side at featurization
time (see tsdiff_tpu/data/featurize.py) and is import-gated there.

The condensed edge encoding (reference utils/datasets.py:507) is
``edge_type = r_type * NUM_BOND_TYPES + p_type`` with 0 = "no bond", and the
higher-order extension assigns k-hop edges type ``NUM_BOND_TYPES + k - 1``
(reference models/common.py:163-167), i.e. 23 for 2-hop, 24 for 3-hop,
25 for 4-hop.
"""

from __future__ import annotations

# RDKit Chem.rdchem.BondType names in enum-value order (RDKit >= 2020.09).
BOND_TYPE_NAMES = (
    "UNSPECIFIED",    # 0  (reference uses 0 to mean "no bond" in condensed types)
    "SINGLE",         # 1
    "DOUBLE",         # 2
    "TRIPLE",         # 3
    "QUADRUPLE",      # 4
    "QUINTUPLE",      # 5
    "HEXTUPLE",       # 6
    "ONEANDAHALF",    # 7
    "TWOANDAHALF",    # 8
    "THREEANDAHALF",  # 9
    "FOURANDAHALF",   # 10
    "FIVEANDAHALF",   # 11
    "AROMATIC",       # 12
    "IONIC",          # 13
    "HYDROGEN",       # 14
    "THREECENTER",    # 15
    "DATIVEONE",      # 16
    "DATIVE",         # 17
    "DATIVEL",        # 18
    "DATIVER",        # 19
    "OTHER",          # 20
    "ZERO",           # 21
)

#: Number of bond types — the base of the condensed edge encoding
#: (``len(BOND_TYPES)`` in reference utils/chem.py:21; == 22).
NUM_BOND_TYPES = len(BOND_TYPE_NAMES)

#: name -> code  (equals the reference's ``BOND_TYPES`` keyed by enum value).
BOND_TYPES = {name: i for i, name in enumerate(BOND_TYPE_NAMES)}
BOND_NAMES = {i: name for i, name in enumerate(BOND_TYPE_NAMES)}


def bond_code_from_rdkit(bond_type) -> int:
    """Map an RDKit BondType enum member to its integer code."""
    return int(bond_type)


def have_rdkit() -> bool:
    try:
        import rdkit

        # the PyG-unpickle stand-in (data/pyg_compat.py) is not a usable
        # rdkit — never let it flip this probe
        return not getattr(rdkit, "__tsdiff_tpu_stub__", False)
    except ImportError:
        return False
