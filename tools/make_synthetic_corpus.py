"""Generate a wb97xd3-SHAPED synthetic reaction corpus at production scale.

The real Grambow wb97xd3 corpus is absent in this environment (BASELINE.md),
so the full-schedule training run (reference configs/train_config.yml:
400k iters x batch 200 over 26,148 reactions) uses a synthetic corpus with a
LEARNABLE graph -> geometry mapping:

  * each reaction is a bent-chain molecule whose bend at atom i is a
    DETERMINISTIC function of the (atom_type[i-1], atom_type[i]) pair via a
    fixed random table — geometry is inferable from the graph, so a trained
    model generalizes to held-out reactions (the val split has unseen type
    sequences, not just unseen noise);
  * sizes follow the documented corpus shape (mean ~14 atoms, 6..23);
  * R has a ring-closure bond that P breaks (a TS-like bond change), and
    r_feat/p_feat carry degree/type one-hots at the production feat_dim 25.

Output: ``train_data.pkl`` / ``valid_data.pkl`` / ``test_data.pkl`` in
--save_dir, loadable by the train CLI and the sampling CLI.

Run: ``python tools/make_synthetic_corpus.py --save_dir data/synthetic``
(~1 min, ~80 MB for the default 26,148 + 2x1,307 reactions).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]

FEAT_DIM = 25
N_TYPES = 8  # atom types 1..8


def _bend_table(seed: int = 7) -> np.ndarray:
    """(9, 9, 3) fixed per-type-pair direction updates — the geometric 'rule'
    the model has to learn."""
    rng = np.random.default_rng(seed)
    return rng.normal(scale=0.45, size=(N_TYPES + 1, N_TYPES + 1, 3))


def make_reaction(rng: np.random.Generator, table: np.ndarray) -> dict:
    from tsdiff_tpu.chem import NUM_BOND_TYPES

    # size distribution: discretized normal, mean 14, sigma 3.5, clipped 6..23
    n = int(np.clip(round(rng.normal(14.0, 3.5)), 6, 23))
    types = rng.integers(1, N_TYPES + 1, size=n).astype(np.int32)

    # deterministic bent-chain geometry from the type sequence
    pos = np.zeros((n, 3), np.float32)
    direction = np.array([1.0, 0.0, 0.0])
    for i in range(1, n):
        direction = direction + table[types[i - 1], types[i]]
        direction = direction / np.linalg.norm(direction)
        pos[i] = pos[i - 1] + 1.5 * direction
    pos -= pos.mean(axis=0)

    # bonds: chain in both R and P; a ring-closure bond present in R only
    # (condensed code r*nb + p, 0 = no bond)
    bm = np.zeros((n, n), np.int64)
    single_single = 1 * NUM_BOND_TYPES + 1
    for i in range(n - 1):
        bm[i, i + 1] = bm[i + 1, i] = single_single
    j = int(rng.integers(3, n))  # ring closure 0-j, broken in P
    bm[0, j] = bm[j, 0] = 1 * NUM_BOND_TYPES + 0

    # features: [type one-hot (8) | R-degree one-hot (4) | P-degree one-hot
    # (4) | in-ring flag | padding to FEAT_DIM]
    def feats(side: str) -> np.ndarray:
        f = np.zeros((n, FEAT_DIM), np.float32)
        f[np.arange(n), types - 1] = 1.0
        r_code = bm // NUM_BOND_TYPES
        p_code = bm % NUM_BOND_TYPES
        adj = (r_code > 0) if side == "r" else (p_code > 0)
        deg = np.clip(adj.sum(1), 0, 3)
        f[np.arange(n), 8 + deg] = 1.0
        if side == "r":
            f[0, 16] = f[j, 16] = 1.0  # ring-closure endpoints
        return f

    return dict(
        atom_type=types,
        r_feat=feats("r"),
        p_feat=feats("p"),
        pos=pos.astype(np.float32),
        bond_mat=bm,
        smiles=f"synthetic-{n}-{j}",
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--n_train", type=int, default=26148)
    parser.add_argument("--n_val", type=int, default=1307)
    parser.add_argument("--n_test", type=int, default=1307)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    from tsdiff_tpu.data import save_dataset

    os.makedirs(args.save_dir, exist_ok=True)
    table = _bend_table()
    rng = np.random.default_rng(args.seed)
    for name, count in (("train_data", args.n_train), ("valid_data", args.n_val),
                        ("test_data", args.n_test)):
        if count == 0:  # e.g. a test-only corpus for campaign scaling
            continue
        graphs = [make_reaction(rng, table) for _ in range(count)]
        path = os.path.join(args.save_dir, f"{name}.pkl")
        save_dataset(path, graphs)
        sizes = [len(g["atom_type"]) for g in graphs]
        print(f"{path}: {count} reactions, atoms mean {np.mean(sizes):.1f} "
              f"min {min(sizes)} max {max(sizes)}")


if __name__ == "__main__":
    main()
