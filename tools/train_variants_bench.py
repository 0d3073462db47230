"""Training step-time sweep on the real TPU: XLA vs the differentiable
Pallas interaction stack (--use_pallas) vs the offset-packed formulation
(--packed_train), at production structure (H=256, 7 convs) across batch
sizes.  Results recorded in BENCH_NOTES.md (round-2 training-variant sweep).

Usage:  python tools/train_variants_bench.py
"""
import sys, time, json
sys.path[:0] = ["/root/repo"]
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _production_model_config, _random_batch
from tsdiff_tpu.config import Config
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
from tsdiff_tpu.models import get_model
from tsdiff_tpu.train import make_optimizer, init_train_state, make_train_step, init_model_params

OPT = Config(type="adam", lr=5e-4, weight_decay=0.0, beta1=0.95, beta2=0.999)

def measure(variant, batch_size, n_pad=24, iters=30):
    cfg = _production_model_config()
    cfg.fused_score = False
    if variant == "pallas":
        cfg.use_pallas = True
    if variant == "packed":
        cfg.packed_train = True
    model = get_model(cfg, dtype=jnp.bfloat16)
    schedule = DiffusionSchedule.from_config(cfg)
    batch = _random_batch(np.random.default_rng(0), batch_size, n_pad)
    params = init_model_params(model, jax.random.key(0), batch)
    tx = make_optimizer(OPT, 3000.0)
    state = init_train_state(model, tx, params)
    step = make_train_step(model, tx, schedule)
    key = jax.random.key(1)
    state, m = step(state, batch, key, 5e-4)  # compile
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.fold_in(key, i), 5e-4)
    float(m["loss"])  # sync
    dt = (time.perf_counter() - t0) / iters * 1e3
    return dt

out = {}
for bs in (200, 400, 800):
    for variant in ("xla", "pallas", "packed"):
        try:
            ms = measure(variant, bs)
            out[f"{variant}_b{bs}"] = round(ms, 2)
            print(f"{variant:7s} batch {bs}: {ms:7.2f} ms/step  ({bs/ms*1000:.0f} graphs/s)", flush=True)
        except Exception as ex:
            print(f"{variant} batch {bs}: FAILED {type(ex).__name__}: {str(ex)[:200]}", flush=True)
print(json.dumps(out))
