"""Protein sidechain demo (DEMO.md): train DSM on subgraphs of a
synthetic chain, regenerate sidechains from noise with the backbone
pinned.  Runs on the real TPU (or CPU with JAX_PLATFORMS=cpu).

Usage: python tools/protein_demo.py
"""
import os, sys, time
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [_ROOT, os.path.join(_ROOT, "tests")]
import numpy as np, jax, jax.numpy as jnp
from test_pdb import _protein_chain, CFG_DSM
from tsdiff_tpu.core.graph import from_numpy_graphs
from tsdiff_tpu.data.pdb import (SidechainConformationDataset,
                                 pack_sidechain_mask, pdb_to_graph)
from tsdiff_tpu.diffusion.dual_objective import (dsm_annealed_sampling,
                                                 dual_dsm_loss, make_dual_eps_fn)
from tsdiff_tpu.models import get_model
from tsdiff_tpu.config import Config
import optax

CFG = Config(dict(CFG_DSM.to_dict()))
CFG.hidden_dim = 64; CFG.num_convs = 3; CFG.num_convs_local = 3

g = pdb_to_graph(_protein_chain(24, seed=11), name="demo_chain")
ds = SidechainConformationDataset([g] * 8, cutoff=8.0, seed=0)
N_PAD = 48
subs = [s for s in (ds[i % 8] for i in range(8)) if s is not None]
batch = from_numpy_graphs(subs, max_nodes=N_PAD)
sc = jnp.asarray(pack_sidechain_mask(subs, N_PAD))

model = get_model(CFG)
params0 = model.init(jax.random.PRNGKey(0), batch.atom_type, batch.pos,
                     batch.bond_mat, batch.node_mask,
                     time_step=jnp.zeros((batch.atom_type.shape[0],), jnp.int32))
opt = optax.adam(3e-4)

@jax.jit
def train_chunk(params, ost, key):
    def body(carry, k):
        p, o = carry
        (loss, _), grads = jax.value_and_grad(
            lambda q: dual_dsm_loss(model, q, batch, k, is_sidechain=sc),
            has_aux=True)(p)
        upd, o = opt.update(grads, o)
        return (optax.apply_updates(p, upd), o), loss
    (params, ost), losses = jax.lax.scan(body, (params, ost), jax.random.split(key, 100))
    return params, ost, losses[-1]

params, ost = params0, opt.init(params0)
t0 = time.perf_counter()
for c in range(80):  # 8000 iters
    params, ost, loss = train_chunk(params, ost, jax.random.PRNGKey(c))
print(f"8000 iters in {time.perf_counter()-t0:.1f}s, final loss {float(loss):.2f}")

def sample_rmsd(p, key, n_steps, lr):
    eps_fn = make_dual_eps_fn(model, p, batch, is_sidechain=sc)
    pos_init = jax.random.normal(key, batch.pos.shape)
    pos, _, nan = dsm_annealed_sampling(
        eps_fn, np.asarray(model.sigmas), pos_init, batch.node_mask, key,
        n_steps=n_steps, step_lr=lr, is_sidechain=sc, pos_gt=batch.pos)
    d = np.asarray(pos) - np.asarray(batch.pos)
    m = np.asarray(sc)
    return float(np.sqrt((d[m] ** 2).sum(-1).mean())), bool(nan)

for lr in (1e-5, 3e-5, 1e-4):
    r, nan = sample_rmsd(params, jax.random.PRNGKey(99), 60, lr)
    print(f"step_lr {lr:.0e}: sidechain RMSD {r:.3f} A (nan={nan})")
