"""Full-protein sidechain generation via covering subgraphs.

Production inference path for the protein/sidechain capability — the piece
the reference never finished (its ``accumulate_grad_from_subgraph``,
utils/datasets.py:1210-1290, stops mid-function): regenerate EVERY sidechain
of a protein whose backbone is known.

Strategy: cover the protein with alpha-centered residue-complete subgraphs
(tsdiff_tpu/data/pdb.py), run the backbone-pinned sampler on padded batches
of subgraphs, and scatter the sampled sidechain coordinates back onto the
full protein.  Because the backbone is pinned to the ground-truth frame in
every subgraph, all subgraphs sample in the SAME global frame — overlapping
sidechain predictions can be averaged directly, no alignment step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tsdiff_tpu.diffusion.dual_objective import (
    dsm_annealed_sampling,
    dual_dynamic_sampling,
    make_dual_eps_fn,
)
from tsdiff_tpu.diffusion.sampler import SamplingSettings


def sample_protein_sidechains(
    model,
    params,
    graph: dict,
    key,
    schedule=None,
    cutoff: float = 10.0,
    batch_size: int = 8,
    n_steps: int = 100,
    step_lr: float = 1e-6,
    global_start_sigma: float = float("inf"),
    w_global: float = 0.2,
    clip: float = 1000.0,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray, bool]:
    """Regenerate all sidechains of one protein from noise.

    Dispatches on ``model.model_type``: ``dsm`` runs the annealed-Langevin
    ladder (reference dualenc.py:1102-1203 semantics), ``diffusion`` the
    reverse-diffusion loop (``schedule`` required).  Returns
    ``(pos (n, 3), counts (n,), nan_flag)`` where ``pos`` equals the input
    backbone exactly and sampled (count-averaged) sidechain coordinates
    elsewhere; atoms covered by no scored subgraph keep their input
    position with count 0.
    """
    from tsdiff_tpu.core.graph import from_numpy_graphs
    from tsdiff_tpu.data.pdb import cover_protein_with_subgraphs, pack_sidechain_mask

    rng = np.random.default_rng(seed)
    subs = cover_protein_with_subgraphs(graph, rng, cutoff)
    n = len(np.asarray(graph["atom_type"]))
    pos_out = np.asarray(graph["pos"], np.float32).copy()
    acc = np.zeros((n, 3), np.float64)
    counts = np.zeros(n, np.int64)
    any_nan = False
    if not subs:
        return pos_out, counts, any_nan

    n_pad = 8 * ((max(len(s["atom_type"]) for s in subs) + 7) // 8)
    for start in range(0, len(subs), batch_size):
        chunk = subs[start : start + batch_size]
        batch = from_numpy_graphs(chunk, max_nodes=n_pad)
        sc = jnp.asarray(pack_sidechain_mask(chunk, n_pad))
        eps_fn = make_dual_eps_fn(
            model, params, batch, w_global=w_global, clip=clip, is_sidechain=sc
        )
        key, k_init, k_run = jax.random.split(key, 3)
        pos_init = jax.random.normal(k_init, batch.pos.shape)
        if model.model_type == "dsm":
            pos, _, nan = dsm_annealed_sampling(
                eps_fn, np.asarray(model.sigmas), pos_init, batch.node_mask,
                k_run, n_steps=n_steps, step_lr=step_lr,
                global_start_sigma=global_start_sigma,
                is_sidechain=sc, pos_gt=batch.pos,
            )
        else:
            assert schedule is not None, "diffusion mode needs a schedule"
            settings = SamplingSettings(sampling_type="ld", n_steps=n_steps, step_lr=step_lr)
            pos, _, nan = dual_dynamic_sampling(
                eps_fn, schedule, pos_init, batch.node_mask, k_run, settings,
                global_start_sigma=global_start_sigma,
                is_sidechain=sc, pos_gt=batch.pos,
            )
        any_nan |= bool(nan)
        pos = np.asarray(pos)
        for b, s in enumerate(chunk):
            m = len(s["atom_type"])
            scm = np.asarray(s["is_sidechain"], bool)
            idx = s["mapping"][scm]
            acc[idx] += pos[b, :m][scm]
            counts[idx] += 1

    nz = counts > 0
    pos_out[nz] = (acc[nz] / counts[nz, None]).astype(np.float32)
    return pos_out, counts, any_nan
