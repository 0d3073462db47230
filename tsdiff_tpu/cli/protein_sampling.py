"""Full-protein sidechain generation CLI.

    python -m tsdiff_tpu.cli.protein_sampling CKPT \
        --protein_set proteins.pkl --save_dir generated [--write_pdb] ...

Completes the protein workflow the reference left unfinished (its
``accumulate_grad_from_subgraph`` inference path, utils/datasets.py:
1210-1290, is dead code): loads a sidechain dataset built by
``preprocessing --pdb_glob``, regenerates every sidechain from noise with
the backbone pinned (tsdiff_tpu/diffusion/protein.py), and writes a results
pickle (and optionally one regenerated ``.pdb`` per protein).
"""

from __future__ import annotations

import argparse
import os
import pickle


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ckpt", type=str, help="dualenc checkpoint (dsm or diffusion)")
    parser.add_argument("--protein_set", type=str, required=True)
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--start_idx", type=int, default=0)
    parser.add_argument("--end_idx", type=int, default=9999)
    parser.add_argument("--cutoff", type=float, default=10.0,
                        help="subgraph-covering ball radius (A)")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="subgraphs per device batch")
    parser.add_argument("--n_steps", type=int, default=None,
                        help="dsm: steps per sigma level (default 100); diffusion: steps of the schedule, default full")
    parser.add_argument("--step_lr", type=float, default=1e-6)
    parser.add_argument("--sigma_respacing", type=int, default=None,
                        help="DSM ladder respacing: anneal through only an "
                             "evenly-strided m-level subsequence of the sigma "
                             "ladder (endpoints kept; cost scales with "
                             "m/num_noise_level; measured quality cost: "
                             "artifacts/protein_ladder_respacing.json)")
    parser.add_argument("--global_start_sigma", type=float, default=float("inf"))
    parser.add_argument("--w_global", type=float, default=0.2)
    parser.add_argument("--clip", type=float, default=1000.0)
    parser.add_argument("--seed", type=int, default=2022)
    parser.add_argument("--use_ema", action="store_true", default=False)
    parser.add_argument("--mesh", type=str, default="auto",
                        help="'auto' shards subgraph batches over all local "
                             "devices dividing --batch_size; 'none' disables; "
                             "or an explicit dp count")
    parser.add_argument("--write_pdb", action="store_true", default=False,
                        help="also write <save_dir>/<name>_gen.pdb per protein")
    parser.add_argument("--multihost", action="store_true", default=False,
                        help="multi-process SPMD (one process per TPU host); "
                             "only process 0 writes results. Auto-detected on "
                             "pods; elsewhere pass --coordinator/--nprocs/--procid")
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--nprocs", type=int, default=None)
    parser.add_argument("--procid", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    if args.multihost:
        from tsdiff_tpu.parallel import multihost as _mh

        _mh.initialize(args.coordinator, args.nprocs, args.procid)
    nproc = jax.process_count()
    is_coord = jax.process_index() == 0

    from tsdiff_tpu.config import Config
    from tsdiff_tpu.data.dataset import load_dataset
    from tsdiff_tpu.data.pdb import write_pdb
    from tsdiff_tpu.diffusion.protein import sample_protein_sidechains
    from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
    from tsdiff_tpu.models import get_model
    from tsdiff_tpu.train import load_checkpoint
    from tsdiff_tpu.utils.misc import get_logger, seed_all

    os.makedirs(args.save_dir, exist_ok=True)
    logger = get_logger("protein_sampling", args.save_dir)
    logger.info(args)

    ck = load_checkpoint(args.ckpt)
    model_cfg = Config(ck["config"]).model
    model = get_model(model_cfg)
    params = ck["params"]
    if args.use_ema:
        if ck.get("ema_params") is None:
            logger.warning("--use_ema: checkpoint has no EMA weights; using raw params")
        else:
            params = ck["ema_params"]
    params = jax.tree_util.tree_map(np.asarray, params)
    schedule = (
        DiffusionSchedule.from_config(model_cfg)
        if model.model_type == "diffusion"
        else None
    )
    seed_all(args.seed)

    mesh = None
    if args.mesh != "none":
        from tsdiff_tpu.parallel import make_mesh

        n_dev = len(jax.devices())
        if args.mesh == "auto":
            dp = max(d for d in range(1, n_dev + 1) if args.batch_size % d == 0)
        else:
            try:
                dp = int(args.mesh)
            except ValueError:
                raise SystemExit(f"--mesh must be 'auto', 'none' or an integer, got {args.mesh!r}")
            if dp < 1 or dp > n_dev:
                raise SystemExit(f"--mesh {dp} outside 1..{n_dev} available devices")
            if args.batch_size % dp != 0:
                raise SystemExit(
                    f"--batch_size {args.batch_size} not divisible by --mesh {dp}"
                )
        if nproc > 1 and dp != n_dev:
            raise SystemExit(
                f"--multihost requires the mesh to span all {n_dev} global "
                f"devices (got dp={dp}; pass --mesh {n_dev} — or 'auto' — "
                f"with --batch_size divisible by {n_dev})"
            )
        if dp > 1:
            mesh = make_mesh(dp=dp, ens=1, devices=jax.devices()[:dp])
            logger.info(
                f"subgraph batches sharded over dp={dp} devices ({nproc} processes)"
            )
            # place params ONCE; the sampler detects already-global/device
            # arrays and skips re-placement per protein
            if nproc > 1:
                from tsdiff_tpu.parallel.multihost import global_from_full
                from tsdiff_tpu.parallel.sharding import replicated_spec

                params = global_from_full(params, replicated_spec(mesh))
            else:
                from tsdiff_tpu.parallel import replicate

                params = replicate(params, mesh)

    graphs, _ = load_dataset(args.protein_set)
    graphs = graphs[args.start_idx : args.end_idx]
    logger.info(f"{len(graphs)} proteins selected")

    results = []
    key = jax.random.PRNGKey(args.seed)
    for i, g in enumerate(graphs):
        key, k = jax.random.split(key)
        pos_gen, counts, nan = sample_protein_sidechains(
            model, params, g, k, schedule=schedule,
            cutoff=args.cutoff, batch_size=args.batch_size,
            n_steps=args.n_steps, step_lr=args.step_lr,
            global_start_sigma=args.global_start_sigma,
            w_global=args.w_global, clip=args.clip, seed=args.seed + i,
            mesh=mesh, sigma_respacing=args.sigma_respacing,
        )
        if nan:
            # same policy as cli/sampling.py: one retry at clip 20
            logger.warning("NaN during sampling; retrying with clip=20")
            key, k = jax.random.split(key)
            pos_gen, counts, nan = sample_protein_sidechains(
                model, params, g, k, schedule=schedule,
                cutoff=args.cutoff, batch_size=args.batch_size,
                n_steps=args.n_steps, step_lr=args.step_lr,
                global_start_sigma=args.global_start_sigma,
                w_global=args.w_global, clip=20.0, seed=args.seed + i + 7919,
                mesh=mesh, sigma_respacing=args.sigma_respacing,
            )
        sc = np.asarray(g["is_sidechain"], bool)
        d = np.linalg.norm(pos_gen[sc] - np.asarray(g["pos"])[sc], axis=-1)
        name = g.get("smiles") or f"protein_{args.start_idx + i}"
        logger.info(
            f"[{i + 1}/{len(graphs)}] {name}: sidechain RMSD "
            f"{float(np.sqrt((d ** 2).mean())):.3f} A, "
            f"covered {int((counts > 0).sum())}/{int(sc.sum())} sidechain atoms"
            + (", NaN flagged" if nan else "")
        )
        entry = dict(
            name=name, pos_gen=pos_gen, pos_gt=np.asarray(g["pos"]),
            is_sidechain=sc, coverage_counts=counts, nan=bool(nan),
        )
        # identity columns ride along so evaluate --protein can compute
        # chi1 accuracy (eval/protein.py)
        for col in ("atom_name", "res_name", "atom2res"):
            if col in g:
                entry[col] = g[col]
        results.append(entry)
        if args.write_pdb and is_coord:
            # index prefix: distinct proteins can share a basename
            base = os.path.basename(str(name)) or "protein"
            out_pdb = os.path.join(args.save_dir, f"{args.start_idx + i:04d}_{base}_gen.pdb")
            with open(out_pdb, "w") as f:
                f.write(write_pdb(g, pos_gen))

    out = os.path.join(args.save_dir, "proteins_gen.pkl")
    if is_coord:  # multi-process: only process 0 writes results
        with open(out, "wb") as f:
            pickle.dump(results, f)
        logger.info(f"Saved {len(results)} results to {out}")
    return out


if __name__ == "__main__":
    main()
