"""Losses and samplers for the GeoDiff-legacy dual-encoder model.

Dense re-derivations of:
  * ``get_loss_diffusion``  (reference models/epsnet/dualenc.py:425-562)
  * ``get_loss_dsm``        (reference models/epsnet/dualenc.py:969-1100)
  * ``langevin_dynamics_sample_diffusion`` score composition
                            (reference dualenc.py:826-850: local + gated,
                             down-weighted global branch)
  * ``langevin_dynamics_sample_dsm`` (reference dualenc.py:1102-1203:
                             sigma-ladder x n_steps annealed Langevin)

The update rules themselves are shared with tsdiff_tpu/diffusion/sampler.py.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from tsdiff_tpu.core.geometry import center_pos, clip_norm, eq_transform, pairwise_distance
from tsdiff_tpu.core.graph import ReactionBatch
from tsdiff_tpu.diffusion.sampler import (
    SamplingSettings,
    build_step_coeffs,
    initial_position,
)
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule


def _branch_losses(
    edge_inv_global, edge_inv_local, edges, d_perturbed, batch, pos_perturbed,
    d_target, cutoff, d_cutoff=None,
):
    """Global/local per-node squared errors (reference dualenc.py:498-532).

    global_mask keeps non-local edges within the cutoff
    (reference dualenc.py:498-504); the local branch uses the typed edges.

    ``d_cutoff`` (optional) is the distance array used ONLY for the cutoff
    test in global_mask.  The protein DSM loss passes the train-edge-replaced
    distances here (reference dualenc.py:1047-1053 tests the replaced
    ``d_perturbed`` against the cutoff) while all eq_transform edge lengths
    stay the original perturbed distances (reference dualenc.py:1060-1086
    passes ``edge_length``, never the replaced copy).
    """
    eg = edge_inv_global[..., 0] if edge_inv_global.ndim == 4 else edge_inv_global
    el = edge_inv_local[..., 0] if edge_inv_local.ndim == 4 else edge_inv_local

    if d_cutoff is None:
        d_cutoff = d_perturbed
    global_mask = (
        ((d_cutoff <= cutoff) | edges.mask_local)
        & ~edges.mask_local
        & edges.mask_global
    )
    target_d_global = jnp.where(global_mask, d_target, 0.0)
    eg = jnp.where(global_mask, eg, 0.0)
    target_pos_global = eq_transform(target_d_global, pos_perturbed, edges.mask_global, d_perturbed)
    node_eq_global = eq_transform(eg, pos_perturbed, edges.mask_global, d_perturbed)
    loss_global = jnp.sum((node_eq_global - target_pos_global) ** 2, axis=-1)

    d_local = jnp.where(edges.mask_local, d_perturbed, 1.0)
    target_pos_local = eq_transform(
        jnp.where(edges.mask_local, d_target, 0.0), pos_perturbed, edges.mask_local, d_local
    )
    node_eq_local = eq_transform(
        jnp.where(edges.mask_local, el, 0.0), pos_perturbed, edges.mask_local, d_local
    )
    loss_local = jnp.sum((node_eq_local - target_pos_local) ** 2, axis=-1)
    return loss_global, loss_local  # (B, N) each


def dual_diffusion_loss(
    model, params, schedule: DiffusionSchedule, batch: ReactionBatch, key,
    anneal_power: float = 2.0,
    is_sidechain: jax.Array | None = None,
) -> tuple[jax.Array, dict]:
    """DDPM loss, (2*global + 5*local)/7 mix (reference dualenc.py:553-554).

    ``is_sidechain`` (B, N) restricts the radius graph to sidechain-touching
    pairs (reference dualenc.py:476 passes it into forward); the train-edge
    distance replacement is commented out in the reference's diffusion loss
    (dualenc.py:487-488) and is correspondingly not applied here — only the
    DSM loss applies it."""
    key_t, key_eps = jax.random.split(key)
    G = batch.batch_size
    # legacy antithetic pairing: t2 = T - t - 1 (reference dualenc.py:446-451)
    sz = G // 2 + 1
    half = jax.random.randint(key_t, (sz,), 0, schedule.num_timesteps)
    t = jnp.concatenate([half, schedule.num_timesteps - half - 1])[:G]
    a = schedule.alphas[t]
    a_pos = a[:, None, None]

    noise = jax.random.normal(key_eps, batch.pos.shape)
    node_mask_f = batch.node_mask[..., None].astype(batch.pos.dtype)
    pos_perturbed = (batch.pos + noise * jnp.sqrt(1 - a_pos) / jnp.sqrt(a_pos)) * node_mask_f

    eg, el, edges, d_pert = model.apply(
        params, batch.atom_type, pos_perturbed, batch.bond_mat, batch.node_mask,
        is_sidechain=is_sidechain,
    )
    d_gt = pairwise_distance(batch.pos, edges.mask_global)
    a_edge = a[:, None, None]
    d_target = (d_gt - d_pert) / jnp.sqrt(1 - a_edge) * jnp.sqrt(a_edge)

    lg, ll = _branch_losses(
        eg, el, edges, d_pert, batch, pos_perturbed, d_target, model.cutoff
    )
    aa, bb = 2.0, 5.0
    loss_node = (aa * lg + bb * ll) / (aa + bb)
    mask = batch.node_mask.astype(loss_node.dtype)
    n = jnp.maximum(mask.sum(), 1.0)
    return jnp.sum(loss_node * mask) / n, {
        "loss_global": jnp.sum(lg * mask) / n,
        "loss_local": jnp.sum(ll * mask) / n,
        "loss_sum": jnp.sum(loss_node * mask),
        "n_nodes": mask.sum(),
    }


def is_train_edge_mask(edges_mask: jax.Array, is_sidechain: jax.Array) -> jax.Array:
    """(B, N, N) edges carrying a training signal: at least one endpoint is a
    sidechain atom (reference dualenc.py:1226-1233 ``is_train_edge``)."""
    sc = is_sidechain.astype(bool)
    return edges_mask & (sc[:, :, None] | sc[:, None, :])


def dual_dsm_loss(
    model, params, batch: ReactionBatch, key, anneal_power: float = 2.0,
    is_sidechain: jax.Array | None = None,
) -> tuple[jax.Array, dict]:
    """Annealed score-matching loss (reference dualenc.py:969-1100):
    2*(1/2)|...|^2 sigma^p global + 5*(1/2)|...|^2 sigma^p local.

    Protein mode (``is_sidechain`` given): backbone-backbone edges carry no
    denoising signal — their perturbed distance is replaced by the ground
    truth (reference dualenc.py:626-628), zeroing d_target there."""
    key_t, key_eps = jax.random.split(key)
    G = batch.batch_size
    sigmas = jnp.asarray(model.sigmas)
    L = sigmas.shape[0]
    sz = G // 2 + 1
    half = jax.random.randint(key_t, (sz,), 0, L)
    t = jnp.concatenate([half, L - half - 1])[:G]
    noise_levels = sigmas[t]
    s_pos = noise_levels[:, None, None]

    noise = jax.random.normal(key_eps, batch.pos.shape)
    node_mask_f = batch.node_mask[..., None].astype(batch.pos.dtype)
    pos_perturbed = (batch.pos + noise * s_pos) * node_mask_f

    eg, el, edges, d_pert = model.apply(
        params, batch.atom_type, pos_perturbed, batch.bond_mat, batch.node_mask,
        time_step=t, is_sidechain=is_sidechain,
    )
    d_gt = pairwise_distance(batch.pos, edges.mask_global)
    # Train-edge replacement (reference dualenc.py:1033-1037): backbone-
    # backbone edges get d_gt, zeroing their d_target.  The replaced copy
    # feeds ONLY d_target and the cutoff test; eq_transform edge lengths and
    # d_local keep the original perturbed distances (dualenc.py:1060-1086).
    d_replaced = d_pert
    if is_sidechain is not None:
        train_mask = is_train_edge_mask(edges.mask_global, is_sidechain)
        d_replaced = jnp.where(train_mask, d_pert, d_gt)
    s_edge = noise_levels[:, None, None]
    d_target = (d_gt - d_replaced) / s_edge**2

    lg, ll = _branch_losses(
        eg, el, edges, d_pert, batch, pos_perturbed, d_target, model.cutoff,
        d_cutoff=d_replaced,
    )
    w = (s_pos[..., 0] ** anneal_power)
    loss_node = 2.0 * 0.5 * lg * w + 5.0 * 0.5 * ll * w
    mask = batch.node_mask.astype(loss_node.dtype)
    n = jnp.maximum(mask.sum(), 1.0)
    return jnp.sum(loss_node * mask) / n, {
        "loss_sum": jnp.sum(loss_node * mask),
        "n_nodes": mask.sum(),
    }


def make_dual_eps_fn(
    model, params, batch: ReactionBatch,
    w_global: float = 0.2,
    global_start_sigma: float = float("inf"),
    clip: float = 1000.0,
    clip_local: float | None = None,
    schedule: DiffusionSchedule | None = None,
    is_sidechain: jax.Array | None = None,
):
    """eps_pos(pos, sigma_gate) for the legacy dual-branch sampler step
    (reference dualenc.py:826-850): local score + gated, down-weighted,
    non-local global score.  ``sigma_gate`` is a precomputed 0/1 float for
    ``sigmas[i] < global_start_sigma`` at the current step."""

    def eps_fn(pos: jax.Array, sigma_gate: jax.Array, time_step=None) -> jax.Array:
        eg, el, edges, d = model.apply(
            params, batch.atom_type, pos, batch.bond_mat, batch.node_mask,
            time_step=time_step, is_sidechain=is_sidechain,
        )
        d_local = jnp.where(edges.mask_local, d, 1.0)
        node_eq_local = eq_transform(
            jnp.where(edges.mask_local, el[..., 0], 0.0), pos, edges.mask_local, d_local
        )
        if clip_local is not None:
            node_eq_local = clip_norm(node_eq_local, clip_local)
        eg_masked = jnp.where(edges.mask_local, 0.0, eg[..., 0])
        node_eq_global = eq_transform(eg_masked, pos, edges.mask_global, d)
        node_eq_global = clip_norm(node_eq_global, clip)
        return node_eq_local + sigma_gate * w_global * node_eq_global

    return eps_fn


def dual_dynamic_sampling(
    eps_fn,
    schedule: DiffusionSchedule,
    pos_init: jax.Array,
    node_mask: jax.Array,
    key: jax.Array,
    settings: SamplingSettings,
    global_start_sigma: float = float("inf"),
    is_sidechain: jax.Array | None = None,
    pos_gt: jax.Array | None = None,
):
    """Legacy diffusion sampling loop (reference dualenc.py:754-967) as a scan,
    sharing the affine update coefficients with the production sampler.

    Protein mode: with ``is_sidechain`` (B, N) and ``pos_gt`` (B, N, 3),
    backbone atoms are pinned to the ground-truth coordinates at init and
    after every step (reference dualenc.py:796-797, 956-957) — only
    sidechain atoms diffuse."""
    if is_sidechain is not None:
        assert pos_gt is not None, "need crd of backbone for sidechain prediction"
    coeffs = build_step_coeffs(schedule, settings)
    sigmas = np.sqrt(1.0 - np.asarray(schedule.alphas, np.float64)) / np.sqrt(
        np.asarray(schedule.alphas, np.float64)
    )
    gates = (sigmas[coeffs.timesteps] < global_start_sigma).astype(np.float32)

    a, b, c = map(jnp.asarray, (coeffs.a, coeffs.b, coeffs.c))
    gates = jnp.asarray(gates)
    tsteps = jnp.asarray(coeffs.timesteps)

    key_init, key_scan = jax.random.split(key)
    # all three entry modes (from noise / denoise_from_time_t /
    # noise_from_time_t) share the production sampler's logic (reference
    # dualenc.py:754-850 implements the same cases as sampler.py:149-182)
    pos0 = initial_position(schedule, settings, pos_init, key_init)
    pos0 = pos0 * node_mask[..., None].astype(pos_init.dtype)

    sc3 = None
    if is_sidechain is not None:
        sc3 = (is_sidechain & node_mask)[..., None]
        pos0 = jnp.where(sc3, pos0, pos_gt)

    B = pos_init.shape[0]

    def step(carry, xs):
        pos, nan_flag, k = carry
        a_k, b_k, c_k, g_k, t_k = xs
        eps_pos = eps_fn(pos, g_k, time_step=jnp.full((B,), t_k))
        noise = jax.random.normal(jax.random.fold_in(key_scan, k), pos.shape, pos.dtype)
        pos_next = a_k * pos + b_k * eps_pos + c_k * noise
        if sc3 is not None:
            pos_next = jnp.where(sc3, pos_next, pos_gt)
        nan_flag = nan_flag | jnp.any(jnp.isnan(pos_next))
        if sc3 is None:
            # Proteins keep the backbone frame: no recentering over pinned
            # atoms.  (The reference recenters after the clamp,
            # dualenc.py:961, then re-pins next step — a per-step centroid
            # shift of the sidechains relative to the backbone that only
            # stays benign because the shift is near zero; pinning without
            # recentering removes the slop entirely.)
            pos_next = center_pos(pos_next, node_mask)
        if settings.clip_pos is not None:
            pos_next = jnp.clip(pos_next, -settings.clip_pos, settings.clip_pos)
        out = pos_next if settings.save_traj else None
        return (pos_next, nan_flag, k + 1), out

    (pos, nan_flag, _), traj = jax.lax.scan(
        step, (pos0, jnp.asarray(False), jnp.asarray(0, jnp.int32)),
        (a, b, c, gates, tsteps),
    )
    return pos, traj, nan_flag


def accumulate_protein_eps(
    model,
    params,
    graph: dict,
    time_step: int = 0,
    cutoff: float = 10.0,
    batch_size: int = 8,
    sigma_gate: float = 1.0,
    w_global: float = 0.2,
    clip: float = 1000.0,
    seed: int = 0,
    pos_override: np.ndarray | None = None,
):
    """Per-atom eps for a FULL protein via covering subgraphs.

    Working counterpart of the reference's unfinished
    ``accumulate_grad_from_subgraph`` (utils/datasets.py:1210-1290): cover
    the protein with alpha-centered residue-complete subgraphs
    (tsdiff_tpu/data/pdb.py), score each padded batch with the dual-encoder
    eps composition, scatter per-atom eps back through each subgraph's
    ``mapping`` and average over the subgraphs containing an atom.

    Returns ``(eps (n, 3) float32, counts (n,) int)``; atoms in no scored
    subgraph (e.g. GLY-only balls) have count 0 and eps 0.
    """
    # lazy import: diffusion/protein.py imports this module
    from tsdiff_tpu.diffusion.protein import covering_batches

    g = dict(graph)
    if pos_override is not None:
        g["pos"] = np.asarray(pos_override, np.float32)
    n = len(np.asarray(graph["atom_type"]))
    eps_acc = np.zeros((n, 3), np.float32)
    counts = np.zeros(n, np.int64)

    for chunk, batch in covering_batches(g, cutoff, batch_size, seed):
        eps_fn = make_dual_eps_fn(
            model, params, batch, w_global=w_global, clip=clip,
            is_sidechain=batch.is_sidechain,
        )
        B = batch.atom_type.shape[0]
        eps = eps_fn(
            batch.pos, jnp.asarray(sigma_gate, jnp.float32),
            time_step=jnp.full((B,), time_step),
        )
        eps = np.asarray(eps)
        for b, s in enumerate(chunk):
            m = len(s["atom_type"])
            eps_acc[s["mapping"]] += eps[b, :m]
            counts[s["mapping"]] += 1

    nz = counts > 0
    eps_acc[nz] /= counts[nz, None]
    return eps_acc, counts


def respaced_sigma_levels(lvl: np.ndarray, m: int | None) -> np.ndarray:
    """Evenly-strided m-element subsequence of the kept ladder levels, both
    endpoints included (the final level must stay sigma_end so the terminal
    noise scale is unchanged).  ``m = None`` or ``m = len(lvl)`` is the full
    ladder.  The returned values are ORIGINAL ladder indices — the model's
    sigma embedding is conditioned on them unchanged."""
    lvl = np.asarray(lvl)
    if m is None or m == len(lvl):
        return lvl
    if not (1 <= m <= len(lvl)):
        raise ValueError(
            f"sigma_respacing={m} must be in [1, {len(lvl)} kept levels]")
    idx = np.round(np.linspace(0, len(lvl) - 1, m)).astype(int)
    idx[-1] = len(lvl) - 1  # m=1 anneals at sigma_end, not sigma_begin
    return lvl[np.unique(idx)]


def dsm_annealed_sampling(
    eps_fn,
    sigmas: np.ndarray,
    pos_init: jax.Array,
    node_mask: jax.Array,
    key: jax.Array,
    n_steps: int = 100,
    step_lr: float = 1e-6,
    min_sigma: float = 0.0,
    clip_pos: float | None = None,
    save_traj: bool = False,
    global_start_sigma: float = float("inf"),
    is_sidechain: jax.Array | None = None,
    pos_gt: jax.Array | None = None,
    sigma_respacing: int | None = None,
):
    """Annealed Langevin over the sigma ladder (reference dualenc.py:1102-1203):
    for each sigma >= min_sigma, n_steps of
    ``pos += step*eps + noise*sqrt(2*step)`` with step = step_lr*(sigma/sigma_L)^2.

    ``sigma_respacing = m``: walk only an evenly-strided m-level subsequence
    of the ladder (both endpoints kept — the final level must stay sigma_end
    so the terminal noise scale is unchanged), n_steps per retained level.
    This is the DSM analog of the diffusion family's timestep respacing: the
    model is still conditioned on each retained level's ORIGINAL index (its
    trained sigma embedding), only the anneal gets coarser.  Cost scales with
    m / num_noise_level; quality cost is measured in
    artifacts/protein_ladder_respacing.json (tools/protein_ladder_respacing.py).

    Protein mode pins backbone atoms to ``pos_gt`` every step (reference
    dualenc.py:956-957); see ``dual_dynamic_sampling`` for the recentering
    note."""
    if is_sidechain is not None:
        assert pos_gt is not None, "need crd of backbone for sidechain prediction"
    sigmas = np.asarray(sigmas, dtype=np.float64)
    keep = sigmas >= min_sigma
    lvl = respaced_sigma_levels(np.where(keep)[0], sigma_respacing)
    step_sizes = step_lr * (sigmas[lvl] / sigmas[-1]) ** 2
    # flatten (level, inner-step) into one scan
    step_flat = np.repeat(step_sizes, n_steps)
    level_flat = np.repeat(lvl, n_steps)
    gates = (sigmas[level_flat] < global_start_sigma).astype(np.float32)

    b = jnp.asarray(step_flat, jnp.float32)
    c = jnp.asarray(np.sqrt(step_flat * 2.0), jnp.float32)
    g = jnp.asarray(gates)
    lv = jnp.asarray(level_flat, jnp.int32)

    key_scan = key
    B = pos_init.shape[0]
    pos0 = pos_init * node_mask[..., None].astype(pos_init.dtype)

    sc3 = None
    if is_sidechain is not None:
        sc3 = (is_sidechain & node_mask)[..., None]
        pos0 = jnp.where(sc3, pos0, pos_gt)

    def step(carry, xs):
        pos, nan_flag, k = carry
        b_k, c_k, g_k, lv_k = xs
        eps_pos = eps_fn(pos, g_k, time_step=jnp.full((B,), lv_k))
        noise = jax.random.normal(jax.random.fold_in(key_scan, k), pos.shape, pos.dtype)
        pos_next = pos + b_k * eps_pos + c_k * noise
        if sc3 is not None:
            pos_next = jnp.where(sc3, pos_next, pos_gt)
        nan_flag = nan_flag | jnp.any(jnp.isnan(pos_next))
        if sc3 is None:
            pos_next = center_pos(pos_next, node_mask)
        if clip_pos is not None:
            pos_next = jnp.clip(pos_next, -clip_pos, clip_pos)
        out = pos_next if save_traj else None
        return (pos_next, nan_flag, k + 1), out

    (pos, nan_flag, _), traj = jax.lax.scan(
        step, (pos0, jnp.asarray(False), jnp.asarray(0, jnp.int32)), (b, c, g, lv)
    )
    return pos, traj, nan_flag
