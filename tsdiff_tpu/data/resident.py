"""Device-resident training corpus: upload once, build batches on device.

Motivation (measured, see BENCH_NOTES "Input-pipeline memory"): this
environment's tunneled TPU client leaks the host staging buffer of EVERY
host->device transfer (~= the array's byte size per transfer; reproduced
with a 30-line jnp.asarray loop, absent on a true CPU backend).  A
streaming input pipeline that device_puts a fresh ~5 MB batch every
iteration therefore leaks ~0.5 MB/iter and OOMs the host partway through a
400k-iteration production run.  Independent of that bug, streaming is also
the wrong TPU-native design for a corpus that fits in HBM: the whole
dataset at production scale packs to a few hundred MB against 16 GB HBM.

Design — the input pipeline becomes three device-side pieces:

  * :class:`DeviceResidentData`: packs the corpus ONCE on the host into
    per-bucket dense arrays (uint8 wire format for one-hot features and
    bond types, f32 positions), device_puts them once, and pads each bucket
    with one all-zero "empty graph" row whose index is the padding target
    for tail batches (exactly the PaddedBatchLoader empty-pad semantics,
    data/dataset.py).
  * per-epoch batch plans: a jitted ``jax.random.permutation`` over each
    bucket's graph indices, padded to a whole number of batches with the
    empty-row index — the plan lives on device; the host only knows its
    static length.
  * :func:`gather_batch`: inside jit, slice the plan at a DEVICE cursor
    (``lax.dynamic_slice``) and gather the batch from the resident arrays.
    The cursor is a device scalar that wraps modulo the plan length, so the
    steady-state loop transfers NOTHING host->device — not even a step
    index.

The reference (torch DataLoader + collate, reference train.py:94-108)
re-packs and re-uploads every batch; this module is the TPU-first
replacement for corpora that fit in HBM.  The streaming
PaddedBatchLoader + Prefetcher path remains for corpora that don't, and
for the sidechain mode whose subgraphs are redrawn every epoch
(cli/train.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tsdiff_tpu.core.graph import ReactionBatch
from tsdiff_tpu.data.dataset import default_buckets, pick_bucket


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class CorpusTooLarge(Exception):
    """Packed corpus exceeds the caller's ``max_bytes`` budget.  Raised
    BEFORE any device upload so the caller can fall back to streaming
    without having transferred (and, on leaky tunneled clients, leaked)
    gigabytes first."""


class DeviceResidentData:
    """Per-bucket device-resident corpus with on-device batch plans.

    Parameters
    ----------
    graphs: list of numpy graph dicts (the on-disk format, data/dataset.py).
    batch_size: graphs per batch (static; one compile per bucket).
    bucket_sizes: atom-count bucket ladder; default as PaddedBatchLoader.
    seed: base seed for the per-epoch on-device permutations.
    put: optional fn(np.ndarray) -> jax.Array placing an array on device
         (e.g. ``lambda a: jax.device_put(a, replicated_spec(mesh))``).
         Default: plain ``jnp.asarray`` (default device).
    """

    def __init__(self, graphs, batch_size: int, bucket_sizes=None, seed: int = 0,
                 put=None, max_bytes: int | None = None, upload: bool = True):
        if len(graphs) == 0:
            raise ValueError("empty corpus")
        put = put or jnp.asarray
        self.batch_size = int(batch_size)
        max_nodes = max(int(np.asarray(g["atom_type"]).shape[0]) for g in graphs)
        if bucket_sizes is None:
            bucket_sizes = default_buckets(max_nodes)
        self.bucket_sizes = sorted(int(b) for b in bucket_sizes)
        self.feat_dim = int(np.asarray(graphs[0]["r_feat"]).shape[-1])

        by_bucket: dict[int, list[dict]] = {b: [] for b in self.bucket_sizes}
        for g in graphs:
            n = int(np.asarray(g["atom_type"]).shape[0])
            by_bucket[pick_bucket(n, self.bucket_sizes)].append(g)

        # host-side packing, one pass; device upload only after the whole
        # corpus is packed and (if max_bytes is set) confirmed to fit — an
        # oversized corpus must not transfer a byte (CorpusTooLarge)
        host_buckets: dict[int, dict[str, np.ndarray]] = {}
        self.n_graphs: dict[int, int] = {}
        self.n_batches: dict[int, int] = {}
        for bsize, gs in by_bucket.items():
            if not gs:
                continue
            M = len(gs)
            F = self.feat_dim
            # +1 row: the all-zero empty graph used for tail-batch padding
            atom = np.zeros((M + 1, bsize), np.uint8)
            rf = np.zeros((M + 1, bsize, F), np.uint8)
            pf = np.zeros((M + 1, bsize, F), np.uint8)
            pos = np.zeros((M + 1, bsize, 3), np.float32)
            bond = np.zeros((M + 1, bsize, bsize), np.uint8)
            mask = np.zeros((M + 1, bsize), bool)
            for i, g in enumerate(gs):
                n = int(np.asarray(g["atom_type"]).shape[0])
                at = np.asarray(g["atom_type"])
                if at.max(initial=0) > 255 or at.min(initial=0) < 0:
                    raise ValueError("atom_type exceeds uint8 wire format")
                atom[i, :n] = at
                rfi = np.asarray(g["r_feat"])
                pfi = np.asarray(g["p_feat"])
                if (rfi.max(initial=0) > 255 or pfi.max(initial=0) > 255
                        or rfi.min(initial=0) < 0 or pfi.min(initial=0) < 0):
                    raise ValueError("one-hot features exceed uint8 wire format")
                rf[i, :n] = rfi
                pf[i, :n] = pfi
                if g.get("pos") is not None:
                    pos[i, :n] = g["pos"]
                if "bond_mat" in g:
                    bm = np.asarray(g["bond_mat"])
                    if bm.max(initial=0) > 255 or bm.min(initial=0) < 0:
                        raise ValueError("bond types exceed uint8 wire format")
                    bond[i, :n, :n] = bm
                else:
                    ei = np.asarray(g["edge_index"])
                    et = np.asarray(g["edge_type"])
                    if et.max(initial=0) > 255 or et.min(initial=0) < 0:
                        raise ValueError("bond types exceed uint8 wire format")
                    bond[i, ei[0], ei[1]] = et
                mask[i, :n] = True
            host_buckets[bsize] = {
                "atom_type": atom,
                "r_feat": rf,
                "p_feat": pf,
                "pos": pos,
                "bond_mat": bond,
                "node_mask": mask,
            }
            self.n_graphs[bsize] = M
            self.n_batches[bsize] = _ceil_div(M, self.batch_size)

        self._nbytes = sum(
            a.nbytes for arrs in host_buckets.values() for a in arrs.values()
        )
        if max_bytes is not None and self._nbytes > max_bytes:
            raise CorpusTooLarge(
                f"packed corpus is {self._nbytes / 1e9:.2f} GB "
                f"(> {max_bytes / 1e9:.2f} GB budget)"
            )
        self._put = put
        self._seed = seed
        self._host_buckets: dict[int, dict[str, np.ndarray]] | None = host_buckets
        self.buckets: dict[int, dict[str, jax.Array]] = {}
        # jitted per-bucket plan builders (one compile per bucket)
        self._plan_fns: dict[int, callable] = {}
        if upload:
            self.upload()

    def upload(self) -> "DeviceResidentData":
        """Transfer the packed corpus to device (idempotent).  With
        ``upload=False`` at construction, callers can inspect ``nbytes`` of
        SEVERAL corpora (e.g. train + val against a shared HBM budget) and
        only then trigger the transfers — an over-budget pair must not move
        a byte."""
        if self._host_buckets is None:
            return self
        put = self._put
        self.buckets = {
            bsize: {k: put(a) for k, a in arrs.items()}
            for bsize, arrs in self._host_buckets.items()
        }
        self._host_buckets = None  # free the host copies

        # Derive the base key data on the CPU backend: creating the key on
        # the accelerator and reading it back is a device->host round-trip
        # of an extended-dtype array, which this environment's tunneled TPU
        # client services pathologically slowly (~2 min for 8 bytes,
        # measured; plain D2H of a 4 MB buffer is 0.15 s).
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            key_data = np.asarray(jax.random.key_data(jax.random.key(self._seed)))
        self._base_key = put(key_data)
        return self

    @property
    def nbytes(self) -> int:
        return self._nbytes

    def epoch_schedule(self) -> list[int]:
        """Static bucket sequence for one epoch — one entry per batch,
        buckets visited in ascending size order (same visit order as
        PaddedBatchLoader._plan)."""
        out = []
        for b in self.bucket_sizes:
            out.extend([b] * self.n_batches.get(b, 0))
        return out

    def _plan_fn(self, bsize: int):
        fn = self._plan_fns.get(bsize)
        if fn is None:
            M = self.n_graphs[bsize]
            n_slots = self.n_batches[bsize] * self.batch_size

            def build(key_data, epoch):
                key = jax.random.wrap_key_data(key_data)
                key = jax.random.fold_in(jax.random.fold_in(key, epoch), bsize)
                perm = jax.random.permutation(key, M)
                pad = jnp.full((n_slots - M,), M, jnp.int32)
                return jnp.concatenate([perm.astype(jnp.int32), pad])

            fn = jax.jit(build)
            self._plan_fns[bsize] = fn
        return fn

    def make_plan(self, bsize: int, epoch: int) -> jax.Array:
        """Device plan for one bucket-epoch: a permutation of the bucket's
        graph indices padded with the empty-row index to whole batches.
        Built on device (only the epoch integer crosses the wire)."""
        return self._plan_fn(bsize)(self._base_key, epoch)

    def fixed_plan(self, bsize: int) -> jax.Array:
        """Unshuffled plan (validation): indices in corpus order + padding.
        Built host-side and placed through ``put`` so it is a global array
        under multi-process meshes (a bare jnp array would be process-local
        and rejected by the SPMD step)."""
        M = self.n_graphs[bsize]
        n_slots = self.n_batches[bsize] * self.batch_size
        plan = np.concatenate(
            [np.arange(M, dtype=np.int32), np.full((n_slots - M,), M, np.int32)]
        )
        return self._put(plan)


def gather_batch(arrays: dict, plan: jax.Array, cursor: jax.Array,
                 batch_size: int) -> ReactionBatch:
    """Inside-jit batch assembly: slice ``plan`` at ``cursor`` (a device
    scalar counting batches, wrapped modulo the plan length) and gather the
    resident rows.  Emits the same dtypes as ``from_numpy_graphs``
    (core/graph.py): int32 atom/bond, uint8 features, f32 positions."""
    n_batches = plan.shape[0] // batch_size
    slot = (cursor % n_batches) * batch_size
    idx = jax.lax.dynamic_slice(plan, (slot,), (batch_size,))
    return ReactionBatch(
        atom_type=arrays["atom_type"][idx].astype(jnp.int32),
        r_feat=arrays["r_feat"][idx],
        p_feat=arrays["p_feat"][idx],
        pos=arrays["pos"][idx],
        bond_mat=arrays["bond_mat"][idx].astype(jnp.int32),
        node_mask=arrays["node_mask"][idx],
        is_sidechain=None,
    )
