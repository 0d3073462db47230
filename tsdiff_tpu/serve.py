"""Batching inference service for TS generation (serving story).

The reference has no serving path (one-shot CLI scripts only); production
deployment wants a resident process that keeps the compiled sampler warm and
amortizes requests into fixed-shape batches.  This module provides:

  * :class:`SamplerService` — a thread-safe request batcher around the
    ensemble sampler: requests queue up, a worker groups them by size
    bucket, pads each group to a fixed tier shape (max_batch, /2, /4, ... —
    one XLA compilation per (bucket, tier), ever), runs the jitted reverse
    diffusion, and resolves per-request futures.
  * ``python -m tsdiff_tpu.serve CKPT... --port 8000`` — a minimal stdlib
    HTTP front end: ``POST /generate`` with JSON graphs returns generated
    coordinates; ``GET /healthz`` liveness.

Graphs use the standard dict layout (data/dataset.py): ``atom_type (n,)``,
``r_feat``/``p_feat`` ``(n, F)``, ``edge_index (2, E)`` + ``edge_type (E,)``
(or dense ``bond_mat``), all JSON arrays over HTTP.
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import threading
import time
from concurrent.futures import Future


class ServiceOverloaded(RuntimeError):
    """Raised by ``submit`` when the bounded request queue is full
    (backpressure: the caller should retry later or shed load)."""


@dataclasses.dataclass
class _Request:
    graph: dict
    future: Future
    n_atoms: int
    deadline: float | None = None  # time.monotonic() cutoff, None = no limit
    respacing: int | None = None   # draft tier: strided step count (None = full)


class SamplerService:
    """Resident ensemble sampler with request batching.

    One worker thread owns the device; ``submit`` is thread-safe and returns
    a ``concurrent.futures.Future`` resolving to
    ``{"pos_gen": (n, 3) float32, "nan": bool}``.
    """

    def __init__(
        self,
        ckpt_paths: list[str],
        n_steps: int = 5000,
        sampling_type: str = "ld",
        step_lr: float = 1e-7,
        clip: float = 1000.0,
        dtype: str = "bfloat16",
        fused_score: bool = False,
        quant: str | None = None,
        use_ema: bool = False,
        max_batch: int = 32,
        max_wait_s: float = 0.05,
        seed: int = 2022,
        mesh=None,
        max_pending: int | None = None,
        default_timeout_s: float | None = None,
        draft_respacing: int | None = None,
    ):
        """``mesh``: optional Mesh with a ``dp`` axis — bucket batches shard
        over devices, stacked ensemble params shard over ``ens`` when the
        axis is present (sizes must divide max_batch and the tier ladder).

        ``max_pending``: bound on queued (not-yet-running) requests; a full
        queue makes ``submit`` raise :class:`ServiceOverloaded`
        (backpressure).  Default ``4 * max_batch``; pass 0 for unbounded.

        ``default_timeout_s``: server-side deadline applied to every request
        that doesn't pass its own ``timeout_s``; expired requests are failed
        with ``TimeoutError`` instead of occupying a batch slot.

        ``draft_respacing``: step count of the fast-draft quality tier —
        requests submitted with ``quality="draft"`` run a DDIM-respaced
        ``draft_respacing``-step walk of the same ``n_steps`` window
        (~``n_steps/draft_respacing``x cheaper; quality delta measured in
        artifacts/respacing_curve.json).  Draft and full requests batch
        separately (different compiled programs)."""
        import jax
        import jax.numpy as jnp

        from tsdiff_tpu.config import Config
        from tsdiff_tpu.diffusion.ensemble import stack_params
        from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
        from tsdiff_tpu.models import get_model
        from tsdiff_tpu.train import load_checkpoint, select_params

        cks = [load_checkpoint(p) for p in ckpt_paths]
        model_cfg = Config(cks[0]["config"]).model
        if fused_score:
            model_cfg.fused_score = True
        if quant is not None:
            assert fused_score, "quant requires fused_score"
            model_cfg.score_quant = quant
        self.model = get_model(
            model_cfg, dtype=jnp.bfloat16 if dtype == "bfloat16" else None
        )
        self.schedule = DiffusionSchedule.from_config(model_cfg)

        self.stacked = stack_params(
            [jax.tree_util.tree_map(jnp.asarray, select_params(ck, use_ema)[0])
             for ck in cks]
        )
        self.mesh = mesh
        self._dp = 1
        self._nproc = jax.process_count()
        self._is_coord = jax.process_index() == 0
        self._feat_dim = int(model_cfg.feat_dim)
        if self._nproc > 1 and mesh is None:
            raise ValueError(
                "multi-process serving requires a mesh spanning all global "
                "devices (e.g. SamplerService(..., mesh=make_mesh(dp=D, "
                "ens=E)); the CLI flag is --mesh D,E)"
            )
        if mesh is not None:
            from tsdiff_tpu.parallel import shard_ensemble_params

            self._dp = dict(mesh.shape).get("dp", 1)
            ens_ax = dict(mesh.shape).get("ens", 1)
            if ens_ax > 1:
                assert len(cks) % ens_ax == 0, (
                    f"{len(cks)} ensemble members not divisible by ens={ens_ax}"
                )
            if self._nproc > 1:
                # SPMD serving: the mesh must span every process's devices;
                # params place as global arrays (ens-sharded or replicated)
                assert self._dp * ens_ax == len(jax.devices()), (
                    f"multi-process serving needs the mesh to span all "
                    f"{len(jax.devices())} global devices "
                    f"(got dp={self._dp} x ens={ens_ax})"
                )
                from jax.sharding import NamedSharding, PartitionSpec as P

                from tsdiff_tpu.parallel.multihost import global_from_full

                spec = NamedSharding(mesh, P("ens") if ens_ax > 1 else P())
                self.stacked = global_from_full(
                    jax.device_get(self.stacked), spec
                )
            elif ens_ax > 1:
                self.stacked = shard_ensemble_params(self.stacked, mesh)
            assert max_batch % self._dp == 0, (
                f"max_batch {max_batch} not divisible by dp={self._dp}"
            )
        self.n_steps = n_steps
        self.sampling_type = sampling_type
        self.step_lr = step_lr
        self.clip = clip
        if draft_respacing is not None and not (1 <= draft_respacing <= n_steps):
            raise ValueError(
                f"draft_respacing={draft_respacing} must be in [1, n_steps={n_steps}]"
            )
        self.draft_respacing = draft_respacing
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self.seed = seed
        self.default_timeout_s = default_timeout_s
        self._runners: dict[int, object] = {}  # bucket -> jitted fn
        if max_pending is None:
            max_pending = 4 * max_batch
        self._q: queue.Queue[_Request | None] = queue.Queue(maxsize=max_pending)
        self._served = 0
        self._timed_out = 0
        self._cancelled = 0
        self._rejected = 0
        self._closed = False
        # serializes the closed-check+enqueue in submit() against close()
        # setting _closed, so no request can land behind the shutdown
        # sentinel (its future would never resolve)
        self._submit_lock = threading.Lock()
        self._worker = None
        if self._is_coord:
            # worker processes never batch requests — they follow the
            # coordinator's broadcasts in worker_loop() instead
            self._worker = threading.Thread(target=self._loop, daemon=True)
            self._worker.start()

    # -- client API ---------------------------------------------------------

    def submit(
        self,
        graph: dict,
        timeout_s: float | None = None,
        quality: str = "full",
    ) -> Future:
        """Enqueue one graph; returns a Future resolving to
        ``{"pos_gen", "nan"}``.

        Raises :class:`ServiceOverloaded` when the bounded queue is full.
        ``timeout_s`` sets a server-side deadline (fails with ``TimeoutError``
        if the request hasn't STARTED by then); cancel an unstarted request
        with ``future.cancel()`` — it then never occupies a batch slot.

        ``quality``: ``"full"`` (every diffusion step) or ``"draft"`` (the
        respaced fast tier; requires the service to be constructed with
        ``draft_respacing``)."""
        import numpy as np

        if quality not in ("full", "draft"):
            raise ValueError(f"quality must be 'full' or 'draft', got {quality!r}")
        respacing = None
        if quality == "draft":
            if self.draft_respacing is None:
                raise ValueError(
                    "draft-quality request but the service has no draft tier "
                    "(pass draft_respacing=... / --draft_respacing)"
                )
            respacing = self.draft_respacing
        fut: Future = Future()
        n = int(np.asarray(graph["atom_type"]).shape[0])
        if timeout_s is None:
            timeout_s = self.default_timeout_s
        deadline = time.monotonic() + timeout_s if timeout_s is not None else None
        req = _Request(graph=graph, future=fut, n_atoms=n, deadline=deadline,
                       respacing=respacing)
        if not self._is_coord:
            raise RuntimeError(
                "submit() on a worker process — only the coordinator "
                "accepts requests; this process should run worker_loop()"
            )
        # validate the shape contract HERE, failing only this request: a
        # malformed graph reaching the batcher would (multi-process) desync
        # the broadcast collective against the workers' model-config-derived
        # placeholders and wedge the whole cluster
        for feat in ("r_feat", "p_feat"):
            width = int(np.asarray(graph[feat]).shape[-1])
            if width != self._feat_dim:
                raise ValueError(
                    f"{feat} width {width} != model feat_dim {self._feat_dim}"
                )
        if n < 1:
            raise ValueError("empty graph")
        if self._nproc > 1 and graph.get("is_sidechain") is not None:
            raise ValueError(
                "is_sidechain graphs are not servable multi-process (the "
                "broadcast placeholder is molecular); use protein_sampling"
            )
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("service closed")
            try:
                self._q.put_nowait(req)
            except queue.Full:
                self._rejected += 1
                raise ServiceOverloaded(
                    f"request queue full ({self._q.maxsize} pending)"
                ) from None
        return fut

    def generate(
        self,
        graphs: list[dict],
        timeout_s: float | None = None,
        quality: str = "full",
    ) -> list[dict]:
        """Blocking convenience: submit all, wait for all.  All-or-nothing:
        if the queue fills mid-submit the already-queued part is cancelled."""
        futs: list[Future] = []
        try:
            for g in graphs:
                futs.append(self.submit(g, timeout_s=timeout_s, quality=quality))
        except ServiceOverloaded:
            for f in futs:
                f.cancel()
            raise
        return [f.result() for f in futs]

    def close(self, drain: bool = True):
        """Stop the worker.  ``drain=True`` (default) serves every request
        already queued before returning; ``drain=False`` cancels them."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
        # past this point no submit() can enqueue (closed-check is under the
        # same lock), so the flush and sentinel below see the final queue
        if not drain:
            # flush: cancel everything still queued (FIFO order preserved so
            # the sentinel lands after the flush)
            try:
                while True:
                    req = self._q.get_nowait()
                    if req is not None and req.future.cancel():
                        self._cancelled += 1
            except queue.Empty:
                pass
        self._q.put(None)
        if self._worker is not None:
            self._worker.join(timeout=600)

    # -- worker -------------------------------------------------------------

    def _collect(self) -> list[_Request] | None:
        """One blocking item, then drain up to max_batch within the window."""
        first = self._q.get()
        if first is None:
            return None
        reqs = [first]
        try:
            while len(reqs) < self.max_batch:
                item = self._q.get(timeout=self.max_wait_s)
                if item is None:
                    self._q.put(None)  # re-queue shutdown for the main loop
                    break
                reqs.append(item)
        except queue.Empty:
            pass
        return reqs

    def _loop(self):
        import numpy as np

        from tsdiff_tpu.data.dataset import default_buckets, pick_bucket

        while True:
            reqs = self._collect()
            if reqs is None:
                if self._nproc > 1:
                    # release the worker processes out of worker_loop()
                    from jax.experimental import multihost_utils as mhu

                    mhu.broadcast_one_to_all(
                        np.asarray([1, 0, 0, 0, 0], np.int32)
                    )
                return
            # group key: (bucket, respacing) — draft- and full-quality
            # requests run different compiled programs so they batch apart
            groups: dict[tuple[int, int], list[_Request]] = {}
            buckets = default_buckets(max(r.n_atoms for r in reqs))
            for r in reqs:
                k = (pick_bucket(r.n_atoms, buckets), r.respacing or 0)
                groups.setdefault(k, []).append(r)
            for (bucket, respacing), group in sorted(groups.items()):
                # shed expired / client-cancelled requests before planning
                # tiers; set_running_or_notify_cancel makes surviving
                # requests uncancellable from here on
                now = time.monotonic()
                live = []
                for r in group:
                    # cancellation check FIRST: set_exception on a future the
                    # client already cancelled raises InvalidStateError and
                    # would kill the worker thread.  After a successful
                    # set_running_or_notify_cancel the future is RUNNING and
                    # set_exception is legal.
                    if not r.future.set_running_or_notify_cancel():
                        self._cancelled += 1
                    elif r.deadline is not None and now > r.deadline:
                        self._timed_out += 1
                        r.future.set_exception(
                            TimeoutError("request deadline expired in queue")
                        )
                    else:
                        live.append(r)
                # split the group into tier-sized chunks (a 54-request group
                # runs as 50 + 4, not padded to the tier-100 shape)
                i = 0
                for tier in self._plan_tiers(len(live)):
                    chunk = live[i : i + tier]
                    i += tier
                    try:
                        self._run_group(bucket, chunk, tier, respacing)
                    except Exception as e:  # noqa: BLE001 - propagate to callers
                        for r in chunk:
                            if not r.future.done():
                                r.future.set_exception(e)

    def _tier_ladder(self) -> list[int]:
        """Descending batch tiers (shared invariant: data/dataset.py
        ``tier_ladder`` — every tier a multiple of dp, floor max(4, dp))."""
        from tsdiff_tpu.data.dataset import tier_ladder

        return tier_ladder(self.max_batch, self._dp)

    def _plan_tiers(self, n: int) -> list[int]:
        """Tier sizes whose chunks cover ``n`` requests, minimizing padded
        slots with a small per-extra-chunk penalty (each dispatch has a
        fixed per-step floor).  One compiled shape per (bucket, tier), ever.
        E.g. max_batch=100: n=54 -> [50, 4] (was: one padded tier-100 run);
        n=5 -> [8] (splitting 4+4 over two dispatches isn't worth 3 slots)."""
        if n == 0:
            return []
        ladder = self._tier_ladder()
        chunk_penalty = max(4, self._dp)

        @functools.lru_cache(maxsize=None)
        def best(m: int) -> tuple[float, tuple[int, ...]]:
            if m == 0:
                return 0.0, ()
            cands = []
            fit = min((t for t in ladder if t >= m), default=None)
            if fit is not None:
                cands.append((float(fit), (fit,)))
            for t in ladder:
                if t <= m:
                    cost, plan = best(m - t)
                    cands.append((t + chunk_penalty + cost, (t,) + plan))
            return min(cands)

        plan: list[int] = []
        while n > self.max_batch:
            plan.append(self.max_batch)
            n -= self.max_batch
        plan.extend(sorted(best(n)[1], reverse=True))
        return plan

    def _batch_tier(self, n: int) -> int:
        """Smallest single tier holding ``n`` requests (compat helper;
        the worker uses :meth:`_plan_tiers`)."""
        tier = self.max_batch
        for t in self._tier_ladder():
            if t >= n:
                tier = t
        return tier

    def _run_group(
        self, bucket: int, group: list[_Request], tier: int, respacing: int = 0
    ):
        import jax
        import numpy as np

        from tsdiff_tpu.core.graph import from_numpy_graphs

        # fixed (tier, bucket) shape: pad with copies of the last graph so
        # each (bucket, tier) pair compiles exactly once per service lifetime
        graphs = [r.graph for r in group]
        gpad = graphs + [graphs[-1]] * (tier - len(graphs))
        batch = from_numpy_graphs(gpad, max_nodes=bucket)
        if self._nproc > 1:
            # SPMD serving: workers mirror this round from the broadcast
            # (header, then the batch content); pos_init/keys derive from
            # the served counter so only the batch itself crosses processes;
            # the 5th header slot carries the draft tier's respacing (0=full)
            from jax.experimental import multihost_utils as mhu

            batch = jax.tree_util.tree_map(np.asarray, batch)
            mhu.broadcast_one_to_all(
                np.asarray([0, bucket, tier, self._served, respacing], np.int32)
            )
            mhu.broadcast_one_to_all(batch)
        pos, nan = self._execute(bucket, tier, batch, respacing)
        self._served += len(group)
        for b, r in enumerate(group):
            r.future.set_result(
                {"pos_gen": pos[b, : r.n_atoms].astype(np.float32), "nan": nan}
            )

    def _execute(self, bucket: int, tier: int, batch, respacing: int = 0):
        """Device side of one round — identical on every process (the NaN
        retry branch reads a replicated flag, so all processes take it or
        none do).  Returns ``(pos (tier, bucket, 3) np, nan bool)``."""
        import jax
        import numpy as np

        key = jax.random.key(self.seed * 7919 + self._served)
        pos_init = jax.random.normal(
            jax.random.fold_in(key, 1), (tier, bucket, 3)
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if self._nproc > 1:
                from tsdiff_tpu.parallel.multihost import (
                    global_from_full,
                    global_key,
                )
                from tsdiff_tpu.parallel.sharding import batch_spec

                batch = global_from_full(batch, batch_spec(self.mesh))
                pos_init = global_from_full(
                    np.asarray(pos_init), NamedSharding(self.mesh, P("dp"))
                )
                key = global_key(key, self.mesh)
            else:
                from tsdiff_tpu.parallel import shard_batch

                batch = shard_batch(batch, self.mesh)
                pos_init = jax.device_put(
                    pos_init, NamedSharding(self.mesh, P("dp"))
                )
        runner = self._runners.get((bucket, respacing))
        if runner is None:
            runner = self._make_runner(respacing=respacing)
            self._runners[(bucket, respacing)] = runner
        res = runner(self.stacked, batch, pos_init, jax.random.fold_in(key, 2))
        nan = bool(np.asarray(res.nan_detected)) if res.nan_detected is not None else False
        if nan and self.clip > 20.0:
            # same policy as the sampling CLI: one retry at clip 20
            retry = self._runners.get((bucket, respacing, "retry"))
            if retry is None:
                retry = self._make_runner(clip=20.0, respacing=respacing)
                self._runners[(bucket, respacing, "retry")] = retry
            res = retry(self.stacked, batch, pos_init, jax.random.fold_in(key, 3))
            nan = bool(np.asarray(res.nan_detected))
        out = res.pos
        if self._nproc > 1:
            from tsdiff_tpu.parallel.multihost import replicate_output

            out = replicate_output(out, self.mesh)
        return np.asarray(out), nan

    def _placeholder_batch(self, bucket: int, tier: int):
        """Shape/dtype twin of a (bucket, tier) batch for the worker side of
        ``broadcast_one_to_all`` (values ignored on non-source processes)."""
        import numpy as np

        import jax

        from tsdiff_tpu.core.graph import from_numpy_graphs

        dummy = {
            "atom_type": np.ones(1, np.int32),
            "r_feat": np.zeros((1, self._feat_dim), np.float32),
            "p_feat": np.zeros((1, self._feat_dim), np.float32),
            "pos": np.zeros((1, 3), np.float32),
            "bond_mat": np.zeros((1, 1), np.int32),
        }
        batch = from_numpy_graphs([dummy] * tier, max_nodes=bucket)
        return jax.tree_util.tree_map(np.asarray, batch)

    def worker_loop(self):
        """Non-coordinator entry point for multi-process serving: follow the
        coordinator's broadcasts (one header + one batch per round) and run
        the same SPMD computation until the shutdown header arrives.

        Every process constructs the service identically (same checkpoints,
        mesh, and settings); process 0 serves requests, the rest call this.
        """
        import numpy as np

        from jax.experimental import multihost_utils as mhu

        assert not self._is_coord, "worker_loop() is for non-coordinators"
        assert self._nproc > 1, "worker_loop() requires a multi-process mesh"
        placeholders: dict[tuple[int, int], object] = {}
        while True:
            hdr = mhu.broadcast_one_to_all(np.zeros(5, np.int32))
            cmd, bucket, tier, served, respacing = (int(x) for x in hdr)
            if cmd == 1:
                return
            ph = placeholders.get((bucket, tier))
            if ph is None:  # values are ignored on non-source hosts: cache
                ph = placeholders[(bucket, tier)] = self._placeholder_batch(
                    bucket, tier
                )
            batch = mhu.broadcast_one_to_all(ph)
            self._served = served  # keys/pos_init derive from this
            try:
                self._execute(bucket, tier, batch, respacing)
            except Exception as e:  # noqa: BLE001
                # _execute runs AFTER both broadcasts and is the same SPMD
                # program on every process, so a failure here hits the
                # coordinator's round too (its _loop catches, fails the
                # chunk's futures, and keeps serving) — mirror that per-round
                # containment instead of letting the worker die and zombify
                # the broadcast protocol
                import sys as _sys

                print(f"worker round failed (contained): {e!r}",
                      file=_sys.stderr)

    def _make_runner(self, clip: float | None = None, respacing: int = 0):
        import jax

        from tsdiff_tpu.diffusion.ensemble import make_ensemble_score_fn
        from tsdiff_tpu.diffusion.sampler import (
            SamplingSettings,
            dynamic_sampling,
            final_frame_scale,
        )

        settings = SamplingSettings(
            sampling_type=self.sampling_type,
            n_steps=self.n_steps,
            step_lr=self.step_lr,
            clip=self.clip if clip is None else clip,
            timestep_respacing=respacing or None,
        )
        scale = final_frame_scale(self.schedule, settings)

        @jax.jit
        def run(stacked, batch, pos_init, key):
            res = dynamic_sampling(
                make_ensemble_score_fn(self.model, stacked, batch),
                self.schedule, pos_init, batch.node_mask, key, settings,
            )
            return res._replace(pos=res.pos * scale)

        return run


# -- HTTP front end ---------------------------------------------------------


def main(argv=None):
    import argparse
    import json

    import numpy as np

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ckpt", type=str, nargs="+")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--n_steps", type=int, default=5000)
    parser.add_argument("--sampling_type", type=str, default="ld")
    parser.add_argument("--step_lr", type=float, default=1e-7)
    parser.add_argument("--clip", type=float, default=1000.0)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--fused_score", action="store_true", default=False)
    parser.add_argument("--use_ema", action="store_true", default=False)
    parser.add_argument("--max_batch", type=int, default=32)
    parser.add_argument("--max_wait_ms", type=float, default=50.0)
    parser.add_argument("--max_pending", type=int, default=None,
                        help="bounded queue size (default 4*max_batch; 0 = unbounded)")
    parser.add_argument("--timeout_s", type=float, default=None,
                        help="server-side default request deadline")
    parser.add_argument("--draft_respacing", type=int, default=None,
                        help="step count of the fast-draft quality tier "
                             "(DDIM-respaced subsequence of the n_steps "
                             "window); requests opt in with quality='draft'")
    parser.add_argument("--mesh", type=str, default="none",
                        help="DP,ENS device mesh (e.g. '4,2') or 'none'")
    parser.add_argument("--compile_cache", type=str, default=None,
                        help="persistent XLA compilation cache dir (or set "
                             "TSDIFF_COMPILE_CACHE): restarted servers skip "
                             "the per-(bucket,tier) compiles")
    parser.add_argument("--multihost", action="store_true", default=False,
                        help="multi-process SPMD serving: process 0 runs the "
                             "HTTP server + batcher, other processes follow "
                             "its broadcasts (worker_loop). Auto-detected on "
                             "pods; elsewhere pass --coordinator/--nprocs/--procid")
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--nprocs", type=int, default=None)
    parser.add_argument("--procid", type=int, default=None)
    args = parser.parse_args(argv)

    from tsdiff_tpu.utils.compile_cache import maybe_enable_compile_cache

    maybe_enable_compile_cache(args.compile_cache)

    if args.multihost:
        if args.mesh == "none":
            raise SystemExit(
                "--multihost requires --mesh DP,ENS spanning all global "
                "devices (e.g. --mesh 8,1 on two 4-chip hosts)"
            )
        from tsdiff_tpu.parallel import multihost as _mh

        _mh.initialize(args.coordinator, args.nprocs, args.procid)

    mesh = None
    if args.mesh != "none":
        from tsdiff_tpu.parallel import make_mesh

        dp, _, ens = args.mesh.partition(",")
        mesh = make_mesh(dp=int(dp), ens=int(ens) if ens else 1)

    service = SamplerService(
        args.ckpt, n_steps=args.n_steps, sampling_type=args.sampling_type,
        step_lr=args.step_lr, clip=args.clip, dtype=args.dtype,
        fused_score=args.fused_score, use_ema=args.use_ema,
        max_batch=args.max_batch, max_wait_s=args.max_wait_ms / 1e3,
        mesh=mesh, max_pending=args.max_pending,
        default_timeout_s=args.timeout_s,
        draft_respacing=args.draft_respacing,
    )

    if not service._is_coord:
        # worker process: no HTTP — follow the coordinator's broadcasts
        # until it shuts down
        service.worker_loop()
        return

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    def graph_from_json(d: dict) -> dict:
        g = {
            "atom_type": np.asarray(d["atom_type"], np.int32),
            "r_feat": np.asarray(d["r_feat"], np.float32),
            "p_feat": np.asarray(d["p_feat"], np.float32),
            "pos": np.asarray(d["pos"], np.float32) if d.get("pos") is not None else None,
        }
        if "bond_mat" in d:
            g["bond_mat"] = np.asarray(d["bond_mat"], np.int32)
        else:
            g["edge_index"] = np.asarray(d["edge_index"], np.int32)
            g["edge_type"] = np.asarray(d["edge_type"], np.int32)
        return g

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "ok": True, "served": service._served,
                    "pending": service._q.qsize(),
                    "timed_out": service._timed_out,
                    "cancelled": service._cancelled,
                    "rejected": service._rejected,
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                graphs = [graph_from_json(d) for d in req["graphs"]]
                results = service.generate(
                    graphs, timeout_s=req.get("timeout_s"),
                    quality=req.get("quality", "full"),
                )
                self._json(200, {
                    "pos_gen": [r["pos_gen"].tolist() for r in results],
                    "nan": [r["nan"] for r in results],
                })
            except ServiceOverloaded as e:
                self._json(503, {"error": f"overloaded: {e}"})
            except TimeoutError as e:
                self._json(504, {"error": f"timeout: {e}"})
            except Exception as e:  # noqa: BLE001 - report to client
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    httpd = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"tsdiff_tpu sampler serving on http://{args.host}:{args.port} "
          f"(POST /generate, GET /healthz)")
    try:
        httpd.serve_forever()
    finally:
        service.close()


if __name__ == "__main__":
    main()
