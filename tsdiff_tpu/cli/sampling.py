"""Ensemble TS-generation CLI — reference-sampling.py-compatible workflow.

Usage:
    python -m tsdiff_tpu.cli.sampling CKPT [CKPT ...] --test_set X --save_dir OUT \
        [--sampling_type ld --n_steps 5000 --step_lr 1e-7 ...]

Mirrors reference sampling.py: loads N checkpoints (self-describing — the
model is rebuilt from the embedded config), preprocesses the test set (.txt
SMARTS list / tsdiff_tpu .pkl dataset / a raw SMARTS string), batches with
optional per-reaction repetition, runs ensemble reverse diffusion, rescales
trajectories by sqrt(alpha), and pickles incremental + final results.

Reference bugs fixed (SURVEY.md appendix): the NaN retry now actually applies
clip=20 (reference sets a dead local, sampling.py:234-236); --resume takes a
results path (reference declared store_true but used it as a path); the .pkl
test-set branch opens the file for reading (reference opened with mode "w",
truncating it, sampling.py:149).
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def batching(items, batch_size, repeat_num=1):
    """Repeat each item repeat_num times, then chunk (reference sampling.py:26-43)."""
    expanded = []
    for x in items:
        expanded.extend([dict(x) for _ in range(repeat_num)])
    for i in range(0, len(expanded), batch_size):
        yield expanded[i : i + batch_size]


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ckpt", type=str, nargs="+", help="checkpoint path(s) for the ensemble")
    parser.add_argument("--batch_size", type=int, default=100)
    parser.add_argument("--resume", type=str, default=None, help="path to partial results pickle")
    parser.add_argument("--save_traj", action="store_true", default=False)
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--feat_dict", type=str, default="./data/TS/wb97xd3/random_split_42/feat_dict.pkl")
    parser.add_argument("--test_set", type=str, required=True,
                        help=".txt smarts list | tsdiff_tpu .pkl dataset | a raw smarts string")
    parser.add_argument("--start_idx", type=int, default=0)
    parser.add_argument("--end_idx", type=int, default=9999)
    parser.add_argument("--repeat", type=int, default=1)
    parser.add_argument("--from_ts_guess", action="store_true", default=False)
    parser.add_argument("--denoise_from_time_t", type=int, default=None)
    parser.add_argument("--noise_from_time_t", type=int, default=None)
    parser.add_argument("--clip", type=float, default=1000.0)
    parser.add_argument("--n_steps", type=int, default=5000)
    parser.add_argument("--sampling_type", type=str, default="ld",
                        help="ld | ddpm | ddpm_noisy | ddpm_det | generalized")
    parser.add_argument("--timestep_respacing", type=int, default=None,
                        help="walk an evenly-strided M-step subsequence of the "
                             "n_steps window instead of every step (DDIM-style "
                             "respacing; each update pairs timestep i with the "
                             "previous subsequence element). Cuts per-sample cost "
                             "~n_steps/M; quality-gated in tests/test_respacing.py "
                             "and BENCH_NOTES.md")
    parser.add_argument("--sigma_respacing", type=int, default=None,
                        help="DSM-family analog of --timestep_respacing: "
                             "anneal through only an evenly-strided m-level "
                             "subsequence of the sigma ladder (endpoints "
                             "kept). Measured quality cost: "
                             "artifacts/protein_ladder_respacing.json")
    parser.add_argument("--eta", type=float, default=1.0)
    parser.add_argument("--step_lr", type=float, default=1e-7)
    parser.add_argument("--seed", type=int, default=2022)
    parser.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    parser.add_argument("--sort_by_size", action="store_true", default=False,
                        help="sort reactions by atom count before batching (homogeneous "
                             "padding buckets, higher throughput; changes result order)")
    parser.add_argument("--use_ema", action="store_true", default=False,
                        help="use EMA weights from checkpoints when present")
    parser.add_argument("--fused_score", action="store_true", default=False,
                        help="fully-fused Pallas score kernel (condensenc + mlp edge encoder only; "
                             "fastest with --dtype bfloat16)")
    parser.add_argument("--quant", type=str, default="none", choices=["none", "int8"],
                        help="with --fused_score: int8 pair matmuls (2x MXU rate on v5e; "
                             "per-row dynamic activation scales, quality-gated vs bf16)")
    parser.add_argument("--mesh", type=str, default="auto",
                        help="'DP,ENS' device-mesh shape for multi-chip sampling, '1,1' to "
                             "disable, or 'auto' (default): ENS = gcd(#devices, #ckpts) with "
                             "the rest as data parallelism. Members shard over ENS, the batch "
                             "over DP; XLA inserts the score-mean reduction over ICI.")
    parser.add_argument("--multihost", action="store_true", default=False,
                        help="multi-process SPMD sampling (one process per TPU host); "
                             "the mesh spans the GLOBAL device set and only process 0 "
                             "writes results. On pods the cluster is auto-detected; "
                             "elsewhere pass --coordinator/--nprocs/--procid")
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--nprocs", type=int, default=None)
    parser.add_argument("--procid", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.multihost:
        from tsdiff_tpu.parallel import multihost as _mh

        _mh.initialize(args.coordinator, args.nprocs, args.procid)
    nproc = jax.process_count()
    is_coord = jax.process_index() == 0

    from tsdiff_tpu.utils.compile_cache import maybe_enable_compile_cache

    maybe_enable_compile_cache()  # TSDIFF_COMPILE_CACHE env var

    from tsdiff_tpu.config import Config
    from tsdiff_tpu.core.graph import from_numpy_graphs
    from tsdiff_tpu.data import load_dataset
    from tsdiff_tpu.data.dataset import default_buckets, pick_bucket
    from tsdiff_tpu.data.featurize import featurize_smarts_list
    from tsdiff_tpu.diffusion.ensemble import make_ensemble_score_fn, stack_params
    from tsdiff_tpu.diffusion.sampler import (
        SamplingSettings,
        dynamic_sampling,
        final_frame_scale,
        rescale_trajectory,
    )
    from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
    from tsdiff_tpu.models import get_model
    from tsdiff_tpu.train import load_checkpoint
    from tsdiff_tpu.utils.misc import get_logger, seed_all

    os.makedirs(args.save_dir, exist_ok=True)
    logger = get_logger("sampling", args.save_dir)
    logger.info(args)

    # Checkpoints: self-describing; model rebuilt from the embedded config.
    logger.info("Loading checkpoints...")
    cks = [load_checkpoint(p) for p in args.ckpt]
    model_cfg = Config(cks[0]["config"]).model
    if args.fused_score:
        model_cfg.fused_score = True
    if args.quant != "none":
        assert args.fused_score, "--quant requires --fused_score"
        model_cfg.score_quant = args.quant
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    model = get_model(model_cfg, dtype=dtype)
    if args.fused_score and not hasattr(model, "fused_score"):
        logger.warning(
            "--fused_score only applies to condensenc models; ignored for %s",
            type(model).__name__,
        )
    schedule = (
        DiffusionSchedule.from_config(model_cfg)
        if "beta_schedule" in model_cfg
        else None  # dsm models use their sigma ladder instead
    )
    from tsdiff_tpu.train import select_params

    def _pick_params(ck):
        params, used_ema = select_params(ck, args.use_ema)
        if args.use_ema and not used_ema:
            logger.warning("--use_ema: checkpoint has no EMA weights; using raw params")
        return params

    stacked = stack_params(
        [jax.tree_util.tree_map(jnp.asarray, _pick_params(ck)) for ck in cks]
    )
    seed_all(args.seed)

    # Device mesh (SURVEY.md section 2.10: member-per-device ensemble sharding +
    # batch data-parallelism — capability the reference lacks entirely).
    import math as _math

    from tsdiff_tpu.parallel import make_mesh, shard_batch, shard_ensemble_params

    n_devices = len(jax.devices())
    if args.mesh == "auto":
        ens_axis = _math.gcd(n_devices, len(cks))
        dp_axis = n_devices // ens_axis
    else:
        dp_axis, ens_axis = (int(x) for x in args.mesh.split(","))
    mesh = None
    if nproc > 1 and dp_axis * ens_axis != n_devices:
        raise SystemExit(
            f"--multihost sampling requires the mesh to span all "
            f"{n_devices} global devices (got dp={dp_axis} x ens={ens_axis})"
        )
    if dp_axis * ens_axis > 1:
        if len(cks) % ens_axis:
            raise SystemExit(
                f"--mesh {dp_axis},{ens_axis}: {len(cks)} checkpoints not divisible "
                f"by ens={ens_axis}"
            )
        mesh = make_mesh(dp=dp_axis, ens=ens_axis)
        if nproc > 1:
            from jax.sharding import NamedSharding, PartitionSpec as _P

            from tsdiff_tpu.parallel.multihost import global_from_full

            stacked = global_from_full(
                jax.device_get(stacked), NamedSharding(mesh, _P("ens"))
            )
        else:
            stacked = shard_ensemble_params(stacked, mesh)
        logger.info(
            "Sampling on a (dp=%d, ens=%d) device mesh (%d devices, %d processes)",
            dp_axis, ens_axis, dp_axis * ens_axis, nproc,
        )

    # Test set
    logger.info("Loading test set...")
    if args.test_set.endswith(".txt"):
        smarts_list = open(args.test_set).read().strip().split("\n")
        with open(args.feat_dict, "rb") as f:
            feat_dict = pickle.load(f)
        test_set = featurize_smarts_list(smarts_list, feat_dict)
    elif args.test_set.endswith((".pkl", ".pck")):
        test_set, _ = load_dataset(args.test_set)
    else:
        with open(args.feat_dict, "rb") as f:
            feat_dict = pickle.load(f)
        test_set = featurize_smarts_list([args.test_set], feat_dict)
    test_set = [g for i, g in enumerate(test_set) if args.start_idx <= i < args.end_idx]
    if args.sort_by_size:
        test_set = sorted(test_set, key=lambda g: int(g["atom_type"].shape[0]))
    logger.info(f"{len(test_set)} reactions selected")

    done_smiles = set()
    results = []
    if args.resume is not None:
        if nproc > 1 and not os.path.exists(args.resume):
            # every process derives done_smiles from the same file; a resume
            # pickle present only on the coordinator's disk would desync the
            # collective-based cluster mid-campaign — fail fast instead
            raise SystemExit(
                f"--resume {args.resume}: not found on process "
                f"{jax.process_index()}. Under --multihost the resume pickle "
                "must be on a path visible to ALL processes (shared "
                "filesystem, or copy it to each host first)."
            )
        with open(args.resume, "rb") as f:
            results = pickle.load(f)
        done_smiles = {g.get("smiles") for g in results}
        test_set = [g for g in test_set if g.get("smiles") not in done_smiles]
        logger.info(f"Resumed {len(results)} results; {len(test_set)} remaining")

    buckets = default_buckets(max(int(g["atom_type"].shape[0]) for g in test_set))

    # Batch-row tier ladder: halvings of batch_size (floor max(4, dp); every
    # tier stays a multiple of dp so the leading axis shards evenly).  Every
    # batch is padded up to a tier with duplicates of its last reaction
    # (dropped at unbatching), so the whole campaign compiles at most
    # len(ladder) x len(buckets) programs instead of one per distinct batch
    # length, and padding waste is bounded at 2x on the tail batch.
    from tsdiff_tpu.data.dataset import tier_ladder

    dp_mult = dp_axis if mesh is not None else 1
    base_tier = _ceil_to(args.batch_size, dp_mult)
    tiers = tier_ladder(base_tier, dp_mult, max_tiers=3)

    def _tier(n: int) -> int:
        return min((t for t in tiers if t >= n), default=base_tier)

    import functools

    @functools.lru_cache(maxsize=None)
    def get_runner(n_pad: int, n_rows: int, clip: float):
        """One jitted sampling program per (bucket, tier, clip), compiled on
        first use and reused for every later batch of the same shape — the
        batch, stacked params, pos_init and key are all traced ARGUMENTS
        (reference sampling.py re-traces nothing because torch is eager; a
        naive per-batch jax.jit would recompile the 5000-step scan every
        batch, ~2x the whole campaign's wall-clock)."""
        settings = SamplingSettings(
            sampling_type=args.sampling_type,
            n_steps=args.n_steps,
            step_lr=args.step_lr,
            clip=clip,
            eta=args.eta,
            denoise_from_time_t=args.denoise_from_time_t,
            noise_from_time_t=args.noise_from_time_t,
            save_traj=args.save_traj,
            timestep_respacing=args.timestep_respacing,
        )
        from tsdiff_tpu.models.dualenc import DualEncoderEpsNetwork

        if isinstance(model, DualEncoderEpsNetwork):
            # legacy family: dual-branch eps with w_global gating; member-
            # averaged eps via vmapped eps_fns
            from tsdiff_tpu.diffusion.dual_objective import (
                dsm_annealed_sampling,
                dual_dynamic_sampling,
                make_dual_eps_fn,
            )
            from tsdiff_tpu.diffusion.sampler import SampleResult

            @jax.jit
            def run(stacked, batch, pos_init, key):
                def eps_fn(pos, gate, time_step=None):
                    def member(p):
                        return make_dual_eps_fn(model, p, batch, clip=clip)(
                            pos, gate, time_step
                        )

                    return jnp.mean(jax.vmap(member)(stacked), axis=0)

                if model.model_type == "dsm":
                    if args.timestep_respacing is not None:
                        logger.warning(
                            "--timestep_respacing only applies to the DDPM "
                            "schedule walk; dsm models respace their sigma "
                            "ladder instead — pass --sigma_respacing M "
                            "(measured quality cost: artifacts/"
                            "protein_ladder_respacing.json) or reduce "
                            "--n_steps per level"
                        )
                    pos, traj, nan = dsm_annealed_sampling(
                        eps_fn, model.sigmas, pos_init, batch.node_mask, key,
                        n_steps=args.n_steps, step_lr=args.step_lr,
                        save_traj=args.save_traj,
                        sigma_respacing=args.sigma_respacing,
                    )
                else:
                    pos, traj, nan = dual_dynamic_sampling(
                        eps_fn, schedule, pos_init, batch.node_mask, key, settings
                    )
                return SampleResult(pos=pos, traj=traj, nan_detected=nan)

            return run, settings

        # NOTE: the score closure must be built INSIDE the jitted function —
        # built outside, its precomputed static features become giant HLO
        # constants instead of traced computations.
        @jax.jit
        def run(stacked, batch, pos_init, key):
            return dynamic_sampling(
                make_ensemble_score_fn(model, stacked, batch),
                schedule, pos_init, batch.node_mask, key, settings,
            )

        return run, settings

    def sample_batch(graphs: list[dict], clip: float):
        # pad the batch up to its row tier with duplicates of the last
        # reaction (dropped when unbatching); a tier is always a multiple of
        # dp when a mesh is active, so the leading axis shards evenly
        gpad = list(graphs)
        gpad += [graphs[-1]] * (_tier(len(gpad)) - len(gpad))
        n_pad = max(pick_bucket(int(g["atom_type"].shape[0]), buckets) for g in gpad)
        batch = from_numpy_graphs(gpad, max_nodes=n_pad)
        if mesh is not None:
            if nproc > 1:
                from tsdiff_tpu.parallel.multihost import global_from_full
                from tsdiff_tpu.parallel.sharding import batch_spec

                batch = global_from_full(batch, batch_spec(mesh))
            else:
                batch = shard_batch(batch, mesh)
        runner, settings = get_runner(n_pad, len(gpad), float(clip))
        if args.from_ts_guess:
            assert args.denoise_from_time_t is not None
            guess_key = "ts_guess" if "ts_guess" in gpad[0] else "pos"
            guesses = [g[guess_key] for g in gpad]
            pos_init = np.zeros((len(gpad), n_pad, 3), np.float32)
            for b, g in enumerate(guesses):
                pos_init[b, : len(g)] = g
            start_t = (
                args.noise_from_time_t
                if args.noise_from_time_t is not None
                else args.denoise_from_time_t
            )
            sqrt_a = float(np.sqrt(np.asarray(schedule.alphas)[start_t - 1])) if start_t != 0 else 1.0
            pos_init = jnp.asarray(pos_init) / sqrt_a
        else:
            pos_init = jax.random.normal(
                jax.random.key(args.seed + len(results)), (len(gpad), n_pad, 3)
            )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if nproc > 1:
                from tsdiff_tpu.parallel.multihost import global_from_full

                pos_init = global_from_full(
                    jax.device_get(pos_init), NamedSharding(mesh, P("dp"))
                )
            else:
                pos_init = jax.device_put(pos_init, NamedSharding(mesh, P("dp")))
        key = jax.random.key(args.seed * 7919 + len(results))
        if nproc > 1:
            from tsdiff_tpu.parallel.multihost import global_key

            key = global_key(key, mesh)
        res = runner(stacked, batch, pos_init, key)
        return batch, res, settings

    from tqdm.auto import tqdm

    for graphs in tqdm(list(batching(test_set, args.batch_size, args.repeat)),
                       disable=not is_coord):
        res = None
        for attempt, clip in enumerate([args.clip, 20.0]):  # retry at clip=20 on NaN
            batch, res, settings = sample_batch(graphs, clip)
            if not bool(res.nan_detected):
                break
            if attempt == 0:
                logger.warning("NaN detected; retrying with clipping thresh 20.")
        nan_persisted = bool(res.nan_detected)
        if nan_persisted:
            logger.error(
                "NaN persisted after the clip-20 retry; batch results are "
                "flagged nan_persisted=True (reference silently kept them)."
            )
        # final positions: scaled frame -> physical frame.  ~1 for a full
        # run, essential for denoise_from_time_t > n_steps (the reference
        # always rescales, sampling.py:210-216); dsm runs unscaled.
        if nproc > 1:
            # all-gather the dp-sharded results so every process holds the
            # full value (a collective: every process must execute it)
            from tsdiff_tpu.parallel.multihost import replicate_output

            res = res.__class__(
                pos=replicate_output(res.pos, mesh),
                traj=replicate_output(res.traj, mesh)
                if res.traj is not None else None,
                nan_detected=res.nan_detected,
            )
        pos = np.asarray(res.pos)
        if schedule is not None and getattr(model, "model_type", "diffusion") != "dsm":
            pos = pos * final_frame_scale(schedule, settings)
        traj = None
        if args.save_traj and res.traj is not None:
            traj = (
                np.asarray(rescale_trajectory(res.traj, schedule, settings))
                if schedule is not None
                else np.asarray(res.traj)
            )
        for b, g in enumerate(graphs):
            n = int(g["atom_type"].shape[0])
            out = dict(g)
            out["pos_gen"] = traj[:, b, :n] if traj is not None else pos[b, :n]
            if nan_persisted:
                out["nan_persisted"] = True
            results.append(out)
            done_smiles.add(out.get("smiles"))
        if is_coord:  # multi-process: only process 0 writes result pickles
            with open(os.path.join(args.save_dir, "samples_not_all.pkl"), "wb") as f:
                pickle.dump(results, f)

    save_path = os.path.join(args.save_dir, "samples_all.pkl")
    if is_coord:
        partial = os.path.join(args.save_dir, "samples_not_all.pkl")
        if os.path.exists(partial):
            os.remove(partial)
        logger.info("Saving samples to: %s" % save_path)
        with open(save_path, "wb") as f:
            pickle.dump(results, f)
    return save_path


if __name__ == "__main__":
    main()
