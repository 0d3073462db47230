"""Padded dense reaction-graph batch — the TPU-native replacement for PyG Data/Batch.

The reference batches variable-size molecular graphs as disjoint unions with
concatenated node/edge arrays and a ``batch`` segment-id vector (PyG
``Batch.from_data_list``, reference train.py:94-97, sampling.py:170).  Every
per-graph operation then goes through torch_scatter.  That representation is
hostile to XLA: edge counts change every sampling step (the radius graph is
rebuilt on moving coordinates, reference models/common.py:344), forcing
dynamic shapes.

Here a batch is a stack of fixed-size padded graphs:

  * ``atom_type``  (B, N)      int32   atomic numbers, 0-padded
  * ``r_feat``     (B, N, F)   uint8 one-hot reactant atom features
  * ``p_feat``     (B, N, F)   uint8 one-hot product atom features
  * ``pos``        (B, N, 3)   float32 coordinates (TS for training data)
  * ``bond_mat``   (B, N, N)   int32   condensed bond types
                               ``r_type * NUM_BOND_TYPES + p_type`` with 0 =
                               no bond (dense form of the reference's
                               ``edge_index``/``edge_type``,
                               reference utils/datasets.py:491-507)
  * ``node_mask``  (B, N)      bool    True for real atoms

``N`` is a compile-time bucket size; every (B, N) combination compiles once.
All graph-level reductions become masked dense ops — no scatter, no dynamic
shapes, MXU-friendly adjacency matmuls.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ReactionBatch:
    atom_type: jax.Array  # (B, N) int32
    r_feat: jax.Array     # (B, N, F) uint8 one-hots (cast to compute dtype in-model)
    p_feat: jax.Array     # (B, N, F) uint8
    pos: jax.Array        # (B, N, 3) float32
    bond_mat: jax.Array   # (B, N, N) int32 condensed edge types
    node_mask: jax.Array  # (B, N) bool
    # optional protein-mode mask (tsdiff_tpu/data/pdb.py); None for molecules.
    # Carried inside the batch so loaders/prefetch/sharding/training treat
    # protein batches identically to reaction batches.
    is_sidechain: jax.Array | None = None  # (B, N) bool

    @property
    def batch_size(self) -> int:
        return self.atom_type.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.atom_type.shape[1]

    @property
    def num_nodes(self) -> jax.Array:
        """(B,) number of real atoms per graph."""
        return jnp.sum(self.node_mask.astype(jnp.int32), axis=-1)

    def replace(self, **kwargs) -> "ReactionBatch":
        return dataclasses.replace(self, **kwargs)


def from_numpy_graphs(graphs: list[dict], max_nodes: int | None = None) -> ReactionBatch:
    """Pack host-side graph dicts into a padded ReactionBatch (numpy, host-side).

    Each graph dict has keys ``atom_type (n,)``, ``r_feat (n,F)``,
    ``p_feat (n,F)``, ``pos (n,3)`` and either ``bond_mat (n,n)`` or sparse
    ``edge_index (2,E)`` + ``edge_type (E,)`` (the reference's on-disk form,
    reference utils/datasets.py:509-518).

    Uses the native C++ packer (native/graphbuild.cpp) when available; the
    numpy fallback below is semantically identical (tests/test_native.py).
    """
    n_max = max_nodes or max(int(g["atom_type"].shape[0]) for g in graphs)

    for g in graphs:
        if int(g["atom_type"].shape[0]) > n_max:
            raise ValueError(
                f"graph with {int(g['atom_type'].shape[0])} atoms exceeds "
                f"max_nodes={n_max}"
            )

    sc = None
    if all("is_sidechain" in g for g in graphs):
        B_ = len(graphs)
        sc = np.zeros((B_, n_max), dtype=bool)
        for b, g in enumerate(graphs):
            m = np.asarray(g["is_sidechain"], bool)
            sc[b, : len(m)] = m
        sc = jnp.asarray(sc)

    from tsdiff_tpu.data.native import pack_batch_native

    packed = pack_batch_native(graphs, n_max)
    if packed is not None:
        atom_type, r_feat, p_feat, pos, bond_mat, node_mask = packed
        # one-hot features ship as uint8 (4x less host->device traffic; the
        # models cast to the compute dtype on device)
        return ReactionBatch(
            atom_type=jnp.asarray(atom_type),
            r_feat=jnp.asarray(r_feat.astype(np.uint8)),
            p_feat=jnp.asarray(p_feat.astype(np.uint8)),
            pos=jnp.asarray(pos),
            bond_mat=jnp.asarray(bond_mat),
            node_mask=jnp.asarray(node_mask),
            is_sidechain=sc,
        )
    B = len(graphs)
    feat_dim = int(graphs[0]["r_feat"].shape[-1])

    atom_type = np.zeros((B, n_max), dtype=np.int32)
    r_feat = np.zeros((B, n_max, feat_dim), dtype=np.float32)
    p_feat = np.zeros((B, n_max, feat_dim), dtype=np.float32)
    pos = np.zeros((B, n_max, 3), dtype=np.float32)
    bond_mat = np.zeros((B, n_max, n_max), dtype=np.int32)
    node_mask = np.zeros((B, n_max), dtype=bool)

    for b, g in enumerate(graphs):
        n = int(g["atom_type"].shape[0])
        if n > n_max:
            raise ValueError(f"graph with {n} atoms exceeds max_nodes={n_max}")
        atom_type[b, :n] = g["atom_type"]
        r_feat[b, :n] = g["r_feat"]
        p_feat[b, :n] = g["p_feat"]
        if g.get("pos") is not None:
            pos[b, :n] = g["pos"]
        if "bond_mat" in g:
            bond_mat[b, :n, :n] = g["bond_mat"]
        else:
            ei = np.asarray(g["edge_index"])
            et = np.asarray(g["edge_type"])
            bond_mat[b, ei[0], ei[1]] = et
        node_mask[b, :n] = True

    return ReactionBatch(
        atom_type=jnp.asarray(atom_type),
        r_feat=jnp.asarray(r_feat.astype(np.uint8)),
        p_feat=jnp.asarray(p_feat.astype(np.uint8)),
        pos=jnp.asarray(pos),
        bond_mat=jnp.asarray(bond_mat),
        node_mask=jnp.asarray(node_mask),
        is_sidechain=sc,
    )
