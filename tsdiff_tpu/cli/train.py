"""Training CLI — reference-train.py-compatible workflow.

Usage:
    python -m tsdiff_tpu.cli.train configs/train_config.yml [--logdir ./logs ...]
    python -m tsdiff_tpu.cli.train <previous_log_dir>          # resume

Mirrors reference train.py: YAML config (or a log dir to resume, discovering
the latest checkpoint), seeded setup, infinite training iterator, periodic
validation driving a plateau LR controller, checkpoint-on-improvement with
the config embedded.  Additions over the reference: data-parallel execution
over all local devices via the (dp, ens) mesh when more than one device is
present, bucketed fixed-shape batching, and a --dtype flag for bf16 compute.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil

def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config", type=str, help="config yaml, or a log dir to resume")
    parser.add_argument("--resume_iter", type=int, default=None)
    parser.add_argument("--logdir", type=str, default="./logs")
    parser.add_argument("--pretrain", type=str, default="")
    parser.add_argument("--project", type=str, default="")
    parser.add_argument("--name", type=str, default="")
    parser.add_argument("--tag", type=str, default=None)
    parser.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    parser.add_argument("--max_iters", type=int, default=None, help="override config max_iters")
    parser.add_argument("--profile", action="store_true",
                        help="log per-phase timings; write a jax.profiler device trace")
    parser.add_argument("--ckpt_backend", type=str, default="pickle",
                        choices=["pickle", "orbax"],
                        help="orbax: async per-array checkpoint directories")
    parser.add_argument("--packed_train", action="store_true", default=False,
                        help="offset-packed XLA forward in the loss (condensenc + mlp "
                             "edge encoder; ~2x fewer pair-MLP FLOPs, parity-tested)")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans: fail fast at the op producing a NaN")
    parser.add_argument("--device_data", choices=["auto", "on", "off"], default="auto",
                        help="device-resident corpus: upload the dataset to HBM once and "
                             "assemble batches on device (zero steady-state host->device "
                             "traffic; data/resident.py). auto = on when the packed corpus "
                             "fits comfortably in HBM (<4 GB) and the dataset is not "
                             "sidechain-streamed")
    parser.add_argument("--multihost", action="store_true", default=False,
                        help="multi-process SPMD (one process per TPU host): "
                             "jax.distributed cluster bring-up; every process feeds its "
                             "local shard of each global batch (parallel/multihost.py). "
                             "On TPU pods the cluster is auto-detected; elsewhere pass "
                             "--coordinator/--nprocs/--procid")
    parser.add_argument("--mesh_layout", choices=["flat", "hybrid"], default="flat",
                        help="hybrid: slice-aware (dp_dcn, dp) data parallelism — "
                             "the outer axis spans TPU slices so its gradient "
                             "all-reduce rides DCN while per-slice collectives stay "
                             "on ICI (parallel/sharding.make_hybrid_mesh)")
    parser.add_argument("--num_slices", type=int, default=None,
                        help="hybrid layout: slice count (default: auto-detect; "
                             "CPU emulation needs it explicit)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multihost coordinator address host:port (omit on TPU pods)")
    parser.add_argument("--nprocs", type=int, default=None,
                        help="multihost process count (omit on TPU pods)")
    parser.add_argument("--procid", type=int, default=None,
                        help="multihost process id (omit on TPU pods)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.multihost:
        from tsdiff_tpu.parallel import multihost as mh

        mh.initialize(args.coordinator, args.nprocs, args.procid)
    nproc = jax.process_count()
    proc_id = jax.process_index()
    is_coord = proc_id == 0

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from tsdiff_tpu.utils.compile_cache import maybe_enable_compile_cache

    maybe_enable_compile_cache()  # TSDIFF_COMPILE_CACHE env var

    from tsdiff_tpu.config import load_config, Config
    from tsdiff_tpu.data import PaddedBatchLoader, TSDataset, inf_iterator
    from tsdiff_tpu.data.prefetch import Prefetcher
    from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
    from tsdiff_tpu.models import get_model
    from tsdiff_tpu.train import (
        TrainState,
        get_checkpoint_path,
        init_train_state,
        init_model_params,
        load_checkpoint,
        restore_opt_state,
        make_eval_step,
        make_mesh,
        make_optimizer,
        make_resident_eval_step,
        make_resident_train_step,
        make_train_step,
        replicate,
        save_checkpoint,
        shard_batch,
    )
    from tsdiff_tpu.train.scheduler import get_scheduler
    from tsdiff_tpu.utils.misc import count_parameters, get_logger, get_new_log_dir, seed_all

    resume = os.path.isdir(args.config)
    if resume:
        config_path = glob.glob(os.path.join(args.config, "*.yml"))[0]
        resume_from = args.config
    else:
        config_path = args.config
    config = load_config(config_path)
    config_name = os.path.splitext(os.path.basename(config_path))[0]
    seed_all(config.train.seed)
    if args.max_iters is not None:
        config.train.max_iters = args.max_iters

    tag = args.tag if args.tag is not None else args.name
    if nproc > 1 and not is_coord:
        # every process keeps its own log dir (debuggability); only the
        # coordinator writes checkpoints and wandb
        tag = f"{tag}_proc{proc_id}" if tag else f"proc{proc_id}"
    log_dir = get_new_log_dir(
        args.logdir, prefix=config_name, tag=f"{tag}_resume" if resume else tag
    )
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    logger = get_logger("train", log_dir)
    logger.info(args)
    logger.info(config)
    shutil.copyfile(config_path, os.path.join(log_dir, os.path.basename(config_path)))

    use_wandb = False
    if args.name and args.project and is_coord:
        try:
            import wandb

            wandb.init(project=args.project, name=args.name)
            wandb.config = config.to_dict()
            use_wandb = True
        except ImportError:
            logger.warning("wandb not installed; logging to file only")

    # Datasets
    logger.info("Loading datasets...")
    tpu_cfg = config.get("tpu", Config())
    bucket_sizes = tpu_cfg.get("bucket_sizes", None)
    sidechain_mode = config.dataset.get("type") == "sidechain"
    if sidechain_mode:
        # protein mode: residue-complete subgraphs drawn FRESH each epoch
        # (matching SidechainConformationDataset's draw-per-access semantics,
        # reference utils/datasets.py:1129-1208, whose corpus builders are
        # dead upstream).  Batches carry is_sidechain and the dual
        # objectives train in sidechain mode automatically.
        from tsdiff_tpu.data.dataset import load_dataset
        from tsdiff_tpu.data.pdb import SidechainConformationDataset

        sc_cutoff = config.dataset.get("cutoff", 10.0)
        n_sub = config.dataset.get("subgraphs_per_protein", 50)

        # corpora loaded ONCE; only the subgraph draw is repeated per epoch
        _corpus_cache = {}

        def draw_subgraphs(path, seed, fix):
            if path not in _corpus_cache:
                _corpus_cache[path] = load_dataset(path)[0]
            ds = SidechainConformationDataset(
                _corpus_cache[path], cutoff=sc_cutoff, fix_subgraph=fix, seed=seed
            )
            out = []
            for i in range(len(ds)):
                for _ in range(1 if fix else n_sub):
                    s = ds[i]
                    if s is not None:
                        out.append(s)
            return out

        def sidechain_epochs():
            epoch = 0
            while True:
                loader = PaddedBatchLoader(
                    TSDataset(draw_subgraphs(
                        config.dataset.train, config.train.seed + epoch, False
                    )),
                    config.train.batch_size, shuffle=True,
                    bucket_sizes=bucket_sizes, seed=config.train.seed + epoch,
                )
                yield from loader
                epoch += 1

        train_stream = sidechain_epochs()
        val_set = TSDataset(draw_subgraphs(config.dataset.val, 0, True))
        logger.info(f"sidechain mode: {len(val_set)} fixed val subgraphs; "
                    f"train subgraphs redrawn every epoch")
    else:
        train_set = TSDataset(config.dataset.train)
        val_set = TSDataset(config.dataset.val)
        train_stream = inf_iterator(PaddedBatchLoader(
            train_set, config.train.batch_size, shuffle=True,
            bucket_sizes=bucket_sizes, seed=config.train.seed,
        ))
    if len(val_set) == 0:
        raise SystemExit(
            f"validation set is empty ({config.dataset.val}); training needs "
            "at least one validation graph"
        )
    val_loader = PaddedBatchLoader(
        val_set, config.train.batch_size, shuffle=False, bucket_sizes=bucket_sizes
    )
    # Mesh: data-parallel over the largest device count dividing the batch
    n_dev = len(jax.devices())
    if args.mesh_layout == "hybrid":
        from tsdiff_tpu.parallel import make_hybrid_mesh

        mesh = make_hybrid_mesh(ens=1, num_slices=args.num_slices)
        shape = dict(mesh.shape)
        dp = shape["dp_dcn"] * shape["dp"]  # total data-parallel extent
        if config.train.batch_size % dp != 0:
            raise SystemExit(
                f"--mesh_layout hybrid: batch_size ({config.train.batch_size}) "
                f"not divisible by dp_dcn x dp = {dp}"
            )
    else:
        dp = max(d for d in range(1, n_dev + 1) if config.train.batch_size % d == 0)
        if nproc > 1 and dp != n_dev:
            # the multi-process jit must span every process's devices
            raise SystemExit(
                f"--multihost requires batch_size ({config.train.batch_size}) "
                f"divisible by the {n_dev} global devices"
            )
        mesh = make_mesh(dp=dp, ens=1, devices=jax.devices()[:dp])

    # batch placement: single-process device_put vs per-process local shards
    if nproc > 1:
        import numpy as _np

        from tsdiff_tpu.parallel.multihost import (
            global_from_full,
            global_key,
            make_global_batch,
            make_replicated,
        )
        from tsdiff_tpu.parallel.sharding import replicated_spec as _rspec

        to_device = lambda b: make_global_batch(b, mesh)  # noqa: E731
        # PRNG keys must enter multi-process jits as global arrays; every
        # process derives identical key data from the shared seed.  The hot
        # loop globalizes its key ONCE (splits of a global key stay global),
        # so per-step keys never round-trip through the host.
        _gkey = lambda k: global_key(k, mesh)  # noqa: E731

        def _dev_scalar(x, dt):
            # device scalars (cursors, LR) must also be global, not local
            return global_from_full(_np.asarray(x, dt), _rspec(mesh))
    else:
        to_device = lambda b: shard_batch(b, mesh)  # noqa: E731
        _gkey = lambda k: k  # noqa: E731
        _dev_scalar = lambda x, dt: jnp.asarray(x, dt)  # noqa: E731

    # Input pipeline: device-resident corpus (upload once, zero steady-state
    # host->device traffic — also sidesteps tunneled-client transfer-buffer
    # leaks, data/resident.py) when it fits; else background packing +
    # transfer overlapped with compute.
    train_res = val_res = None
    if args.device_data != "off" and not sidechain_mode:
        from tsdiff_tpu.data.resident import CorpusTooLarge, DeviceResidentData
        from tsdiff_tpu.parallel.sharding import replicated_spec

        if nproc > 1:
            # replicated corpus as GLOBAL arrays (every process holds the
            # same packed data and transfers its addressable shards)
            _put = lambda a: global_from_full(a, _rspec(mesh))  # noqa: E731
        else:
            _put = lambda a: jax.device_put(a, replicated_spec(mesh))  # noqa: E731
        # auto: enforce the HBM budget BEFORE any upload — both corpora are
        # packed host-side first and the COMBINED size checked, so an
        # over-budget pair never transfers (or, on leaky tunneled clients,
        # leaks) a single byte before the streaming fallback
        budget = int(4e9) if args.device_data == "auto" else None
        try:
            train_res = DeviceResidentData(
                train_set.graphs, config.train.batch_size,
                bucket_sizes=bucket_sizes, seed=config.train.seed, put=_put,
                upload=False,
            )
            val_res = DeviceResidentData(
                val_set.graphs, config.train.batch_size,
                bucket_sizes=bucket_sizes, put=_put, upload=False,
            )
            total = train_res.nbytes + val_res.nbytes
            if budget is not None and total > budget:
                raise CorpusTooLarge(
                    f"packed corpus is {total / 1e9:.2f} GB "
                    f"(> {budget / 1e9:.2f} GB budget)"
                )
            train_res.upload()
            val_res.upload()
        except CorpusTooLarge as e:
            logger.info(f"device_data auto: {e}; falling back to the streaming loader")
            train_res = val_res = None
        else:
            logger.info(
                f"device-resident corpus: {(train_res.nbytes + val_res.nbytes)/1e6:.0f} MB in HBM "
                f"(train buckets {train_res.n_batches}, val buckets {val_res.n_batches})"
            )
    train_iter = None
    if train_res is None:
        # background packing + host->device transfer, overlapped with compute
        train_iter = iter(
            Prefetcher(
                train_stream, depth=2,
                transfer=to_device,
            )
        )
    logger.info(
        f"Devices: {n_dev} ({nproc} processes) -> mesh "
        + (f"{dict(mesh.shape)}" if args.mesh_layout == "hybrid"
           else f"(dp={dp}, ens=1)")
    )
    if args.mesh_layout == "flat" and dp < n_dev:
        logger.warning(
            f"batch_size {config.train.batch_size} not divisible by {n_dev} "
            f"devices; using {dp}-way data parallelism"
        )

    # Model / optimizer / schedule
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    if args.packed_train:
        config.model.packed_train = True
    model = get_model(config.model, dtype=dtype)
    schedule = DiffusionSchedule.from_config(config.model)
    tx = make_optimizer(config.train.optimizer, config.train.max_grad_norm)
    t0 = config.model.get("t0", 0)
    t1 = config.model.get("t1", None)
    anneal_power = config.train.get("anneal_power", 2.0)
    ema_decay = config.train.get("ema_decay", None)
    train_step = make_train_step(
        model, tx, schedule, t0=t0, t1=t1, anneal_power=anneal_power,
        ema_decay=ema_decay,
    )
    eval_step = make_eval_step(
        model, schedule, t0=t0, t1=t1, anneal_power=anneal_power
    )
    if train_res is not None:
        from tsdiff_tpu.parallel.sharding import batch_spec

        bspec = batch_spec(mesh) if dp > 1 else None
        res_train_step = make_resident_train_step(
            train_step, config.train.batch_size, bspec
        )
        res_eval_step = make_resident_eval_step(
            eval_step, config.train.batch_size, bspec
        )
        val_plans = {b: val_res.fixed_plan(b) for b in val_res.buckets}
    scheduler = get_scheduler(config.train.scheduler, config.train.optimizer.lr)

    # val loader probe: same feature dims, and doesn't consume the train stream
    try:
        probe = next(iter(val_loader))
    except StopIteration:
        raise SystemExit(
            f"validation set is empty ({config.dataset.val}); training needs "
            "at least one validation graph"
        )
    params = init_model_params(model, jax.random.key(config.train.seed), probe)
    state = init_train_state(model, tx, params, ema_decay=ema_decay)
    start_iter = 1

    if resume:
        ckpt_path, start_iter = get_checkpoint_path(
            os.path.join(resume_from, "checkpoints"), it=args.resume_iter
        )
        logger.info(f"Resuming from {ckpt_path} (iteration {start_iter})")
        ck = load_checkpoint(ckpt_path)
        ema = ck.get("ema_params")
        loaded_params = jax.tree_util.tree_map(jnp.asarray, ck["params"])
        state = TrainState(
            params=loaded_params,
            opt_state=restore_opt_state(state.opt_state, ck["opt_state"]),
            step=jnp.asarray(start_iter, jnp.int32),
            # a pre-EMA checkpoint seeds the EMA from its own weights, never
            # from the fresh random init
            ema_params=jax.tree_util.tree_map(jnp.asarray, ema)
            if ema is not None
            else (loaded_params if ema_decay else None),
        )
        if ck.get("scheduler"):
            scheduler.load_state_dict(ck["scheduler"])

    if args.pretrain:
        logger.info(f"Warm-start weights from {args.pretrain}")
        ck = load_checkpoint(args.pretrain)
        warm = jax.tree_util.tree_map(jnp.asarray, ck["params"])
        state = TrainState(
            params=warm,
            opt_state=state.opt_state,
            step=state.step,
            ema_params=warm if ema_decay else None,
        )

    if nproc > 1:
        # identical local states on every process (same init key / loaded
        # checkpoint) -> one fully-replicated global state
        state = make_replicated(jax.device_get(state), mesh)
    else:
        state = replicate(state, mesh)
    logger.info(f"Parameters: {count_parameters(state.params):,}")

    def validate(it: int) -> float:
        sum_loss, sum_n = 0.0, 0.0
        if train_res is not None:
            vi = 0
            for b, arrs in val_res.buckets.items():
                for ci in range(val_res.n_batches[b]):
                    ls, nn = res_eval_step(
                        state.params, arrs, val_plans[b], ci,
                        _gkey(jax.random.key(10_000_000 + vi)),
                    )
                    sum_loss += float(ls)
                    sum_n += float(nn)
                    vi += 1
        else:
            for vi, batch in enumerate(val_loader):
                ls, nn = eval_step(
                    state.params, to_device(batch), _gkey(jax.random.key(10_000_000 + vi))
                )
                sum_loss += float(ls)
                sum_n += float(nn)
        avg = sum_loss / max(sum_n, 1.0)
        scheduler.step(avg)
        logger.info("[Validate] Iter %05d | Loss %.6f" % (it, avg))
        if use_wandb:
            import wandb

            wandb.log({"val/loss": avg}, step=it)
        return avg

    timer = None
    if args.profile:
        from tsdiff_tpu.utils.profiling import PhaseTimer

        timer = PhaseTimer()

    # globalized once: every split of a global key yields global keys, so
    # the training loop adds no per-step host<->device key traffic
    key = _gkey(jax.random.key(config.train.seed + 1))
    loss_sum = n_sum = grad_norm_sum = 0.0
    window_iters = 0  # iterations in the current log window (short on resume)
    best_loss = float("inf")

    if train_res is not None:
        # device-resident loop state: static bucket schedule; per-epoch
        # on-device plans; device cursors (wrap mod n_batches in-step) —
        # nothing but the epoch integer ever crosses host->device.
        schedule_seq = train_res.epoch_schedule()
        epoch, pos_in_epoch = divmod(start_iter - 1, len(schedule_seq))
        plans = {b: train_res.make_plan(b, epoch) for b in train_res.buckets}
        cursors = {
            b: _dev_scalar(
                sum(1 for x in schedule_seq[:pos_in_epoch] if x == b), jnp.int32
            )
            for b in train_res.buckets
        }
        # LR as a device scalar refreshed only when the plateau controller
        # moves (per-step host scalars would be a per-step transfer)
        lr_host = scheduler.lr
        lr_dev = _dev_scalar(lr_host, jnp.float32)

        def do_step(k):
            nonlocal pos_in_epoch, epoch, plans
            b = schedule_seq[pos_in_epoch]
            st, metrics, cursors[b] = res_train_step(
                state, train_res.buckets[b], plans[b], cursors[b], k, lr_dev
            )
            pos_in_epoch += 1
            if pos_in_epoch == len(schedule_seq):
                pos_in_epoch = 0
                epoch += 1
                plans = {b2: train_res.make_plan(b2, epoch) for b2 in train_res.buckets}
            return st, metrics
    else:

        def do_step(k, batch=None):
            if batch is None:
                batch = next(train_iter)
            return train_step(state, batch, k, scheduler.lr)

    try:
        for it in range(start_iter, config.train.max_iters + 1):
            if timer is not None:
                key, k = jax.random.split(key)
                batch = None
                if train_res is None:
                    # time the host fetch separately so input-pipeline stalls
                    # aren't misattributed to device compute
                    with timer.phase("data"):
                        batch = next(train_iter)
                with timer.phase("train_step"):
                    state, metrics = (
                        do_step(k) if batch is None else do_step(k, batch)
                    )
                    _ = float(metrics["loss"])  # profile mode: true sync per step
            else:
                key, k = jax.random.split(key)
                state, metrics = do_step(k)
            # accumulate ON DEVICE — forcing scalars here would synchronize
            # the host every step and serialize data packing with compute
            loss_sum = loss_sum + metrics["loss_sum"]
            n_sum = n_sum + metrics["n_nodes"]
            grad_norm_sum = grad_norm_sum + metrics["grad_norm"]
            window_iters += 1
            if it % config.train.val_freq == 0 or it == config.train.max_iters:
                loss_sum, n_sum, grad_norm_sum = (
                    float(loss_sum), float(n_sum), float(grad_norm_sum)
                )
                logger.info(
                    "[Train] Iter %05d | Loss %.2f | Grad %.2f | LR %.6f"
                    % (it, loss_sum / max(n_sum, 1), grad_norm_sum / window_iters, scheduler.lr)
                )
                if use_wandb:
                    import wandb

                    wandb.log(
                        {
                            "train/loss": loss_sum / max(n_sum, 1),
                            "train/lr": scheduler.lr,
                            "train/grad_norm": grad_norm_sum / window_iters,
                        },
                        step=it,
                    )
                loss_sum = n_sum = grad_norm_sum = 0.0
                window_iters = 0
                avg_val_loss = validate(it)
                if train_res is not None and scheduler.lr != lr_host:
                    lr_host = scheduler.lr
                    lr_dev = _dev_scalar(lr_host, jnp.float32)
                if avg_val_loss < best_loss:
                    best_loss = avg_val_loss
                    if is_coord:  # only the coordinator writes checkpoints
                        if args.ckpt_backend == "orbax":
                            from tsdiff_tpu.train.orbax_io import (
                                save_checkpoint_orbax,
                            )

                            # async: the write overlaps the next training steps
                            save_checkpoint_orbax(
                                os.path.join(ckpt_dir, f"{it}.orbax"),
                                config,
                                jax.device_get(state),
                                scheduler.state_dict(),
                                iteration=it,
                                avg_val_loss=avg_val_loss,
                            )
                        else:
                            save_checkpoint(
                                os.path.join(ckpt_dir, f"{it}.ckpt"),
                                config,
                                jax.device_get(state),
                                scheduler.state_dict(),
                                iteration=it,
                                avg_val_loss=avg_val_loss,
                            )
                        logger.info(
                            f"Saved checkpoint at iter {it} (val {avg_val_loss:.6f})"
                        )
    except KeyboardInterrupt:
        logger.info("Terminating...")
    finally:
        if args.ckpt_backend == "orbax":
            from tsdiff_tpu.train.orbax_io import wait_for_saves

            wait_for_saves()

    if timer is not None:
        logger.info("Phase timings:\n%s", timer.summary())

    return log_dir


if __name__ == "__main__":
    main()
