"""Serving-stack throughput benchmark (BENCH_NOTES.md serving section).

Production model, birkholz size mix, through the full SamplerService
request -> batch -> bucket -> sample path.  3 fixed-shape waves; the first
compiles.  Usage: python tools/serve_bench.py  (real TPU).
"""
import sys, time
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
                     fused_score=True, max_batch=100, max_wait_s=0.2)

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

# fixed graph set: every wave sees identical (bucket, tier) shapes
graphs = make_graphs(200, np.random.default_rng(1))
for wave in range(3):
    t0 = time.perf_counter(); svc.generate(list(graphs))
    dt = time.perf_counter() - t0
    print(f"wave {wave}: 200 samples in {dt:.1f}s = {200/dt:.2f} samples/s "
          f"({200/dt/0.5:.1f}x baseline)", flush=True)
svc.close()
