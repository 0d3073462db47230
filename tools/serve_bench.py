"""Serving-stack throughput benchmark (BENCH_NOTES.md serving section).

Production model, birkholz size mix, through the full SamplerService
request -> batch -> bucket -> sample path.  Two scenarios:

  * closed-loop: 3 identical 200-request waves (the first compiles) —
    steady-state batch throughput;
  * interactive (--mixed): 4 blocking client threads with jittered think
    time and sizes — per-request latency percentiles at light concurrency
    (tier splitting means small groups run small compiled shapes instead of
    padding to max_batch).

Usage: python tools/serve_bench.py [--mixed] [--quant int8]  (real TPU).
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
args = parser.parse_args()
results_json = {"n_requests": args.n_requests, "quant": args.quant,
                "draft_respacing": args.draft_respacing, "waves": []}

d = tempfile.mkdtemp()
cfg = _production_model_config()
model = get_model(cfg)
batch = _random_batch(np.random.default_rng(0), 2, 24)
params = model.init(jax.random.key(0), batch.atom_type, batch.r_feat,
                    batch.p_feat, batch.pos, batch.bond_mat, batch.node_mask)
ckpt = f"{d}/0.ckpt"
save_checkpoint(ckpt, Config(model=cfg.to_dict()),
                TrainState(params=params, opt_state=None, step=jnp.asarray(0)))

svc = SamplerService([ckpt] * 8, n_steps=5000, dtype="bfloat16",
                     fused_score=True, quant=args.quant, max_batch=100,
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

if args.mixed:
    # interactive scenario: 4 blocking clients with jittered think time;
    # measures per-request latency (submit -> result) at light concurrency
    lat = []
    lock = threading.Lock()
    t_open = time.perf_counter()

    def client(cid):
        rng = np.random.default_rng(100 + cid)
        gs = make_graphs(N // 4, rng)
        for g in gs:
            time.sleep(float(rng.uniform(0.0, 0.8)))
            t0 = time.perf_counter()
            fut = svc.submit(g)
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
    # (concurrency-4) latency scenario, not an open-loop throughput number —
    # the per-request latency percentiles are the signal here
    print(f"interactive (4 blocking clients): {n} samples in {dt:.1f}s "
          f"({n/dt:.2f} samples/s at concurrency 4); latency p50 "
          f"{lat_ms[n//2]:.1f}s p95 {lat_ms[int(n*0.95)]:.1f}s "
          f"max {lat_ms[-1]:.1f}s", flush=True)
    print(f"stats: served {svc._served} timed_out {svc._timed_out} "
          f"cancelled {svc._cancelled} rejected {svc._rejected}", flush=True)
    results_json["interactive"] = {
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
