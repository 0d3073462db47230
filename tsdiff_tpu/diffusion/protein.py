"""Full-protein sidechain generation via covering subgraphs.

Production inference path for the protein/sidechain capability — the piece
the reference never finished (its ``accumulate_grad_from_subgraph``,
utils/datasets.py:1210-1290, stops mid-function): regenerate EVERY sidechain
of a protein whose backbone is known.

Strategy: cover the protein with alpha-centered residue-complete subgraphs
(tsdiff_tpu/data/pdb.py), run the backbone-pinned sampler on padded batches
of subgraphs, and write the sampled sidechain coordinates back onto the full
protein.  Because the backbone is pinned to the ground-truth frame in every
subgraph, all subgraphs sample in the SAME global frame.  Each RESIDUE takes
all of its sidechain atoms from a single owning subgraph (the one whose
center is nearest its CA) — overlapping subgraphs draw independent samples,
and averaging two different rotamers would produce non-physical collapsed
geometry, so overlaps are resolved by ownership, never by averaging.
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


def covering_batches(
    graph: dict, cutoff: float, batch_size: int, seed: int,
    pad_batches: bool = False,
):
    """Yield ``(chunk, batch)`` padded-batch groups of covering subgraphs.

    Shared scaffold for subgraph-ensemble scoring
    (``dual_objective.accumulate_protein_eps``) and sidechain generation
    (``sample_protein_sidechains``): cover, pad to a common multiple-of-8
    node count, chunk.  ``batch.is_sidechain`` carries the per-atom mask
    (core/graph.from_numpy_graphs packs it); each subgraph dict carries
    ``mapping`` (original atom indices) and ``center`` (covering-ball
    center atom).

    ``pad_batches`` pads the tail chunk with empty graphs to a constant
    ``batch_size`` (mesh sharding needs a divisible leading axis; also
    avoids a tail-shape recompile).  ``chunk`` always lists only the REAL
    subgraphs.
    """
    from tsdiff_tpu.core.graph import from_numpy_graphs
    from tsdiff_tpu.data.dataset import _empty_graph
    from tsdiff_tpu.data.pdb import cover_protein_with_subgraphs

    rng = np.random.default_rng(seed)
    subs = cover_protein_with_subgraphs(graph, rng, cutoff)
    if not subs:
        return
    n_pad = 8 * ((max(len(s["atom_type"]) for s in subs) + 7) // 8)
    feat_dim = int(subs[0]["r_feat"].shape[-1])

    for start in range(0, len(subs), batch_size):
        chunk = subs[start : start + batch_size]
        graphs = list(chunk)
        if pad_batches:
            graphs += [
                _empty_graph(feat_dim) for _ in range(batch_size - len(chunk))
            ]
        yield chunk, from_numpy_graphs(graphs, max_nodes=n_pad)


def sample_protein_sidechains(
    model,
    params,
    graph: dict,
    key,
    schedule=None,
    cutoff: float = 10.0,
    batch_size: int = 8,
    n_steps: int | None = None,
    step_lr: float = 1e-6,
    global_start_sigma: float = float("inf"),
    w_global: float = 0.2,
    clip: float = 1000.0,
    seed: int = 0,
    mesh=None,
    sigma_respacing: int | None = None,
) -> tuple[np.ndarray, np.ndarray, bool]:
    """Regenerate all sidechains of one protein from noise.

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``dp`` axis — covering
    subgraph batches shard over devices (params replicated), the protein
    analog of the molecular sampling CLI's ``--mesh``.

    Dispatches on ``model.model_type``: ``dsm`` runs the annealed-Langevin
    ladder with ``n_steps`` PER sigma level (default 100; reference
    dualenc.py:1102-1203 semantics); ``diffusion`` runs the reverse
    diffusion over ``n_steps`` of the schedule counted back from t=T
    (default: the FULL schedule — a partial count would only walk the
    highest-noise steps and never denoise).  No frame rescale is applied in
    either mode: the per-step backbone pin re-anchors the whole system to
    the physical frame, so — unlike the unpinned molecular sampler
    (cli/sampling.py final_frame_scale) — the scan output IS physical, and
    scaling only the free atoms would tear sidechains off the backbone.

    Returns ``(pos (n, 3), counts (n,), nan_flag)``: ``pos`` equals the
    input backbone exactly; each residue's sidechain comes from the one
    covering subgraph whose center is nearest its CA (``counts`` still
    reports how many subgraphs covered each atom); residues covered by no
    scored subgraph keep their input coordinates with count 0.
    """
    is_dsm = model.model_type == "dsm"
    if sigma_respacing is not None and not is_dsm:
        raise ValueError(
            "sigma_respacing is the DSM sigma-ladder respacing; diffusion-"
            "family models use timestep respacing (cli/sampling.py)"
        )
    if n_steps is None:
        n_steps = 100 if is_dsm else None  # diffusion: full schedule below
    if not is_dsm:
        assert schedule is not None, "diffusion mode needs a schedule"
        T = int(np.asarray(schedule.betas).shape[0])
        n_steps = T if n_steps is None else min(n_steps, T)

    n = len(np.asarray(graph["atom_type"]))
    pos_in = np.asarray(graph["pos"], np.float32)
    atom2res = np.asarray(graph["atom2res"])
    pos_out = pos_in.copy()
    counts = np.zeros(n, np.int64)
    # per-residue owner: nearest covering-ball center to the residue's CA
    n_res = int(atom2res.max()) + 1
    owner_dist = np.full(n_res, np.inf)
    # per-residue anchor: the CA position (atom2alpha_index from
    # pdb_to_graph), residue centroid when a residue has no CA
    res_anchor = np.zeros((n_res, 3), np.float32)
    a2a = np.asarray(graph.get("atom2alpha_index", -np.ones(n, np.int64)))
    for r in range(n_res):
        in_r = atom2res == r
        ca = a2a[in_r]
        ca = ca[ca >= 0]
        res_anchor[r] = pos_in[ca[0]] if len(ca) else pos_in[in_r].mean(0)
    any_nan = False

    _place_batch = _fix_key = _collect = lambda x: x  # noqa: E731
    if mesh is not None:
        if jax.process_count() > 1:
            # multi-process mesh: every placement must produce GLOBAL arrays
            # (parallel/multihost.py); results all-gather so the host-side
            # ownership logic below sees complete values on every process
            from tsdiff_tpu.parallel.multihost import (
                global_from_full,
                global_key,
                replicate_output,
            )
            from tsdiff_tpu.parallel.sharding import batch_spec, replicated_spec

            leaf = jax.tree_util.tree_leaves(params)[0]
            if not (isinstance(leaf, jax.Array) and not leaf.is_fully_addressable):
                params = global_from_full(jax.device_get(params), replicated_spec(mesh))
            _place_batch = lambda b: global_from_full(b, batch_spec(mesh))  # noqa: E731
            _fix_key = lambda kk: global_key(kk, mesh)  # noqa: E731
            _collect = lambda x: replicate_output(x, mesh)  # noqa: E731
        else:
            from tsdiff_tpu.parallel import replicate, shard_batch

            params = replicate(params, mesh)
            _place_batch = lambda b: shard_batch(b, mesh)  # noqa: E731

    for chunk, batch in covering_batches(
        graph, cutoff, batch_size, seed, pad_batches=mesh is not None
    ):
        if mesh is not None:
            batch = _place_batch(batch)
        sc = batch.is_sidechain
        eps_fn = make_dual_eps_fn(
            model, params, batch, w_global=w_global, clip=clip, is_sidechain=sc
        )
        key, k_init, k_run = jax.random.split(key, 3)
        pos_init = jax.random.normal(k_init, batch.pos.shape)
        if mesh is not None and jax.process_count() > 1:
            from tsdiff_tpu.parallel.multihost import global_from_full
            from tsdiff_tpu.parallel.sharding import batch_spec

            pos_init = global_from_full(np.asarray(pos_init), batch_spec(mesh))
        k_run = _fix_key(k_run)
        if is_dsm:
            pos, _, nan = dsm_annealed_sampling(
                eps_fn, np.asarray(model.sigmas), pos_init, batch.node_mask,
                k_run, n_steps=n_steps, step_lr=step_lr,
                global_start_sigma=global_start_sigma,
                is_sidechain=sc, pos_gt=batch.pos,
                sigma_respacing=sigma_respacing,
            )
        else:
            settings = SamplingSettings(
                sampling_type="ld", n_steps=n_steps, step_lr=step_lr
            )
            pos, _, nan = dual_dynamic_sampling(
                eps_fn, schedule, pos_init, batch.node_mask, k_run, settings,
                global_start_sigma=global_start_sigma,
                is_sidechain=sc, pos_gt=batch.pos,
            )
        any_nan |= bool(nan)
        pos = np.asarray(_collect(pos))
        for b, s in enumerate(chunk):
            m = len(s["atom_type"])
            scm = np.asarray(s["is_sidechain"], bool)
            idx = s["mapping"][scm]
            if nan and not np.isfinite(pos[b, :m][scm]).all():
                continue  # keep prior coords; do NOT count NaN'd predictions
            counts[idx] += 1
            # residues whose CA is closer to this subgraph's center than to
            # any previous owner take their whole sidechain from this sample
            center = s["center"]
            res_here = np.unique(atom2res[idx])
            d_center = np.linalg.norm(res_anchor[res_here] - pos_in[center], axis=-1)
            better = d_center < owner_dist[res_here]
            take_res = set(res_here[better].tolist())
            if not take_res:
                continue
            take = np.asarray([int(atom2res[i]) in take_res for i in idx])
            pos_out[idx[take]] = pos[b, :m][scm][take].astype(np.float32)
            owner_dist[res_here[better]] = d_center[better]

    return pos_out, counts, any_nan
