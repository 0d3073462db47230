"""Drive the full pipeline on the REAL trained-reference artifact.

The reference checkout ships exactly one artifact produced by its trained
model with real RDKit featurization: 100 ddpm samples of birkholz rxn_0
(``birkholz_benchmark/rxn_0/samples_all.pkl``; the adjacent log.txt
documents the run — trained ens0 weights, 5000 steps, ddpm, seed 2022,
reference sampling.py flow).  Trained weights themselves do NOT ship, so
accuracy parity stays environment-blocked — but this artifact lets us
rehearse every pipeline stage on genuinely real data:

  1. convert real PyG pickles through the torch_geometric/rdkit-free
     stub-unpickle path (data/pyg_compat.py + data/convert.py);
  2. push the REAL production-featurized graph (13 atoms, one-hot width 25
     matching the production feat_dict) through the production sampling CLI
     end to end (random-init production-size weights — structure, shapes,
     and numerics, not accuracy);
  3. exercise the automorphism-aware D-MAE evaluator on a real molecule and
     record the TRAINED reference model's own sample spread — a committed
     yardstick for the day real weights land: our trained model's 100-sample
     spread on rxn_0 should land in the same range.

Run: ``python tools/real_artifact_drill.py [--n_steps N] [--pairs K]``.
CPU-forced; ~60 s.  Skips cleanly (exit 0, message) if the reference
checkout is absent.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import tempfile
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]

REF_SAMPLES = "/root/reference/birkholz_benchmark/rxn_0/samples_all.pkl"


def run(n_steps: int = 100, pairs: int = 500, scratch: str | None = None) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import pickle

    import numpy as np

    from __graft_entry__ import _production_model_config
    from tsdiff_tpu.data.dataset import load_dataset, save_dataset
    from tsdiff_tpu.eval.dmae import (
        get_min_dmae_match,
        graph_automorphisms,
    )
    from tsdiff_tpu.models import get_model

    t0 = time.perf_counter()
    out: dict = {}
    scratch = scratch or tempfile.mkdtemp(prefix="real_artifact_")

    # 1. PyG-free conversion of the real artifact
    graphs, _ = load_dataset(REF_SAMPLES)
    assert len(graphs) == 100, len(graphs)
    g = graphs[0]
    n = int(g["atom_type"].shape[0])
    out["n_atoms"] = n
    out["feat_width"] = int(g["r_feat"].shape[1])
    assert out["feat_width"] == 25, "production feat_dim mismatch"
    print(f"[1] converted {len(graphs)} real samples: {n} atoms, "
          f"feat width {out['feat_width']}, smiles {g['smiles'][:60]}...")

    # 2. trained-reference sample spread under OUR automorphism-aware D-MAE
    ei = np.asarray(g["edge_index"])
    bond = np.zeros((n, n), dtype=np.int64)
    bond[ei[0], ei[1]] = np.asarray(g["edge_type"])
    autos = graph_automorphisms(bond, np.asarray(g["atom_type"]))
    out["n_automorphisms"] = len(autos)
    gens = [np.asarray(x["pos_gen"]) for x in graphs]
    all_pairs = list(itertools.combinations(range(len(gens)), 2))
    rng = np.random.default_rng(0)
    if len(all_pairs) > pairs:
        all_pairs = [all_pairs[i] for i in
                     rng.choice(len(all_pairs), size=pairs, replace=False)]
    vals = np.asarray([
        get_min_dmae_match(gens[i], gens[j], autos)[0] for i, j in all_pairs
    ])
    out["ref_spread_pairs"] = len(all_pairs)
    out["ref_spread_dmae_mean"] = float(vals.mean())
    out["ref_spread_dmae_median"] = float(np.median(vals))
    out["ref_spread_dmae_p90"] = float(np.quantile(vals, 0.9))
    print(f"[2] trained-reference sample spread (automorphism-aware pairwise "
          f"D-MAE over {len(all_pairs)} pairs, {len(autos)} automorphisms): "
          f"mean {out['ref_spread_dmae_mean']:.3f} A, "
          f"median {out['ref_spread_dmae_median']:.3f} A, "
          f"p90 {out['ref_spread_dmae_p90']:.3f} A")

    # 3. the production sampling CLI on the real featurized graph
    test_path = os.path.join(scratch, "rxn0_native.pkl")
    save_dataset(test_path, graphs[:4])

    cfg = _production_model_config()
    cfg.num_diffusion_timesteps = max(n_steps, 2)
    cfg.t1 = cfg.num_diffusion_timesteps
    model = get_model(cfg)
    from tsdiff_tpu.core.graph import from_numpy_graphs

    batch = from_numpy_graphs(graphs[:1], max_nodes=16)
    params = model.init(
        jax.random.key(0), batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    ck_path = os.path.join(scratch, "randinit.ckpt")
    with open(ck_path, "wb") as f:
        pickle.dump({
            "format": "tsdiff_tpu.ckpt.v1",
            "config": {"model": cfg.to_dict()},
            "params": jax.tree.map(np.asarray, params),
            "opt_state": None, "scheduler": None,
            "iteration": 0, "avg_val_loss": None,
        }, f)

    from tsdiff_tpu.cli import sampling as sampling_cli

    save_dir = os.path.join(scratch, "samples")
    sampling_cli.main([
        ck_path, "--test_set", test_path, "--save_dir", save_dir,
        "--n_steps", str(n_steps), "--batch_size", "4",
        "--sampling_type", "ld",
    ])
    with open(os.path.join(save_dir, "samples_all.pkl"), "rb") as f:
        ours = pickle.load(f)
    assert len(ours) == 4
    for s in ours:
        pg = np.asarray(s["pos_gen"])
        assert pg.shape == (n, 3) and np.isfinite(pg).all()
    out["cli_sampled"] = len(ours)
    out["wall_s"] = round(time.perf_counter() - t0, 1)
    print(f"[3] production sampling CLI on the real graph: {len(ours)} "
          f"finite samples of shape ({n}, 3).  Total {out['wall_s']} s")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_steps", type=int, default=100)
    ap.add_argument("--pairs", type=int, default=500,
                    help="pairwise D-MAE sample count for the spread stat")
    args = ap.parse_args(argv)
    if not os.path.exists(REF_SAMPLES):
        print(f"reference artifact not present ({REF_SAMPLES}); nothing to drill")
        return 0
    out = run(n_steps=args.n_steps, pairs=args.pairs)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
