"""Datasets and the padded-batch loader.

Replaces the reference's pickle-list datasets + PyG DataLoader
(``TSDataset`` reference utils/datasets.py:1085-1099, loaders
reference train.py:94-97) with:

  * an on-disk format of plain-numpy graph dicts (no torch/PyG needed to
    read) — ``{"format": "tsdiff_tpu.v1", "graphs": [...], "feat_dict": ...}``;
  * :class:`TSDataset`: list-of-graphs with O(1) access;
  * :class:`PaddedBatchLoader`: shape-bucketed, fixed-size padded batches.
    Where the reference re-traces nothing (eager torch) but pays dynamic
    shapes, we pay padding instead: graphs are bucketed by atom count into a
    small set of compile-time sizes so every (bucket, batch) shape compiles
    exactly once; partial batches are padded with empty graphs (all-False
    node masks) that are exact no-ops in masked losses.

The reference's ``CountNodesPerGraph`` transform (utils/transforms.py:188-196)
is subsumed: node counts are a property of ReactionBatch.  The GeoDiff-legacy
edge-level transforms (AddHigherOrderEdges etc., utils/transforms.py:15-185)
are subsumed by in-model graph extension (core/graph_ops.py).
"""

from __future__ import annotations

import pickle
from typing import Iterator, Sequence

import numpy as np

from tsdiff_tpu.core.graph import from_numpy_graphs

FORMAT_TAG = "tsdiff_tpu.v1"


def save_dataset(path: str, graphs: list[dict], feat_dict=None, extra: dict | None = None):
    payload = {"format": FORMAT_TAG, "graphs": graphs, "feat_dict": feat_dict}
    if extra:
        payload.update(extra)
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_dataset(path: str) -> tuple[list[dict], dict | None]:
    try:
        with open(path, "rb") as f:
            payload = pickle.load(f)
    except (ImportError, AttributeError):
        # a reference PyG pickle references torch_geometric/rdkit at
        # unpickle time — retry with the stand-in modules installed
        payload = None
    if payload is None:
        from tsdiff_tpu.data.pyg_compat import load_pyg_pickle

        payload = load_pyg_pickle(path)
    if isinstance(payload, dict) and payload.get("format") == FORMAT_TAG:
        return payload["graphs"], payload.get("feat_dict")
    if isinstance(payload, list) and payload:
        if isinstance(payload[0], dict):
            return payload, None
        # list of PyG Data objects (reference dataset / samples_all.pkl):
        # convert in memory, same policy as reference .pt checkpoints
        from tsdiff_tpu.data.convert import graphs_from_pyg_list

        try:
            return graphs_from_pyg_list(payload), None
        except (KeyError, TypeError) as e:
            raise ValueError(
                f"{path}: looks like a PyG pickle but is missing reaction "
                f"fields ({e}); convert explicitly with "
                "python -m tsdiff_tpu.data.convert dataset"
            ) from None
    raise ValueError(f"{path}: not a tsdiff_tpu or reference PyG dataset.")


class TSDataset:
    """List-backed dataset of numpy graph dicts (reference utils/datasets.py:1085-1099)."""

    def __init__(self, path_or_graphs):
        if isinstance(path_or_graphs, (list, tuple)):
            self.graphs = list(path_or_graphs)
            self.feat_dict = None
        else:
            self.graphs, self.feat_dict = load_dataset(path_or_graphs)

    def __len__(self) -> int:
        return len(self.graphs)

    def __getitem__(self, idx: int) -> dict:
        return self.graphs[idx]

    @property
    def max_nodes(self) -> int:
        return max(int(g["atom_type"].shape[0]) for g in self.graphs)


def _empty_graph(feat_dim: int) -> dict:
    return dict(
        atom_type=np.zeros((0,), np.int32),
        r_feat=np.zeros((0, feat_dim), np.float32),
        p_feat=np.zeros((0, feat_dim), np.float32),
        pos=np.zeros((0, 3), np.float32),
        edge_index=np.zeros((2, 0), np.int32),
        edge_type=np.zeros((0,), np.int32),
        # present so protein (sidechain) batches keep their mask when a tail
        # batch is padded — from_numpy_graphs packs is_sidechain only when
        # every graph in the batch carries it
        is_sidechain=np.zeros((0,), bool),
    )


def pick_bucket(n: int, bucket_sizes: Sequence[int]) -> int:
    for b in bucket_sizes:
        if n <= b:
            return b
    raise ValueError(f"graph with {n} atoms exceeds the largest bucket {bucket_sizes[-1]}")


def default_buckets(max_nodes: int, multiple: int = 8) -> list[int]:
    """Bucket sizes: multiples of ``multiple`` up to max_nodes rounded up."""
    top = ((max_nodes + multiple - 1) // multiple) * multiple
    return list(range(multiple, top + 1, multiple))


def tier_ladder(base: int, dp: int = 1, max_tiers: int | None = None) -> list[int]:
    """Descending batch-row tiers: ``base`` halved (floor) while the result
    stays >= max(4, dp) AND a multiple of dp — every tier must shard evenly
    over the dp mesh axis.  Shared by the sampling CLI and the serving
    batcher so the sharding invariant lives in one place.

    ``max_tiers`` caps ladder depth: each tier costs one XLA compilation of
    the full sampling scan per bucket, so batch campaigns cap at 3 (padding
    waste on the one tail batch is cheaper than two extra compiles), while
    the serving batcher keeps the full ladder for latency tiering."""
    ladder = [int(base)]
    while ladder[-1] // 2 >= max(4, dp) and (ladder[-1] // 2) % dp == 0:
        if max_tiers is not None and len(ladder) >= max_tiers:
            break
        ladder.append(ladder[-1] // 2)
    return ladder


class PaddedBatchLoader:
    """Yield fixed-shape ReactionBatches, bucketed by graph size.

    Every epoch: (optionally) shuffle, assign each graph to the smallest
    bucket that fits, then emit batches of exactly ``batch_size`` graphs per
    bucket (partial tail batches padded with empty graphs, or dropped with
    ``drop_tail``).  With ``indices_out``, each yielded batch is paired with
    the dataset indices it came from (padding slots = -1).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        bucket_sizes: Sequence[int] | None = None,
        seed: int = 0,
        drop_tail: bool = False,
        with_indices: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.drop_tail = drop_tail
        self.with_indices = with_indices
        if bucket_sizes is None:
            bucket_sizes = default_buckets(dataset.max_nodes)
        self.bucket_sizes = sorted(bucket_sizes)
        self.feat_dim = int(dataset[0]["r_feat"].shape[-1])

    def __len__(self) -> int:
        return sum(1 for _ in self._plan())

    def _plan(self) -> Iterator[tuple[int, list[int]]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            order = self.rng.permutation(order)
        buckets: dict[int, list[int]] = {b: [] for b in self.bucket_sizes}
        for idx in order:
            n = int(self.dataset[int(idx)]["atom_type"].shape[0])
            buckets[pick_bucket(n, self.bucket_sizes)].append(int(idx))
        for bsize, idxs in buckets.items():
            for i in range(0, len(idxs), self.batch_size):
                chunk = idxs[i : i + self.batch_size]
                if len(chunk) < self.batch_size and self.drop_tail:
                    continue
                yield bsize, chunk

    def __iter__(self):
        for bsize, chunk in self._plan():
            graphs = [self.dataset[i] for i in chunk]
            indices = list(chunk)
            while len(graphs) < self.batch_size:
                graphs.append(_empty_graph(self.feat_dim))
                indices.append(-1)
            batch = from_numpy_graphs(graphs, max_nodes=bsize)
            if self.with_indices:
                yield batch, np.asarray(indices)
            else:
                yield batch


def inf_iterator(loader) -> Iterator:
    """Infinite epoch cycler (reference utils/misc.py:66-72)."""
    while True:
        yield from loader
