"""Dense geometry kernels: distances, the SE(3)-equivariant chain rule, utils.

TPU-native re-derivation of reference models/geometry.py and the sampler
helpers at reference models/sampler.py:260-268:

  * ``get_distance`` (reference models/geometry.py:18-19) -> ``pairwise_distance``
    over the full (B, N, N) pair grid with a mask-safe dummy value.
  * ``eq_transform`` (reference models/geometry.py:22-30) — THE core kernel:
    per-edge distance scores s_e chain-ruled into per-atom 3D scores via
    d d_e / d r_i.  In the reference this is two torch_scatter scatter_adds
    over a dynamic edge list; here it is a masked dense contraction (VPU
    elementwise + row reduction), fully fused by XLA into the surrounding
    step — no scatter, no atomics.
  * ``center_pos`` / ``clip_norm`` (reference models/sampler.py:260-268) as
    masked dense ops.

Convention: a dense entry (b, i, j) corresponds to the directed edge
(i -> j) of the reference's edge list; all edge sets here are symmetric, so
both directions are always present, exactly as the reference's
dense_to_sparse of symmetric matrices yields.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_diff(pos: jax.Array) -> jax.Array:
    """(B, N, 3) -> (B, N, N, 3) with diff[b,i,j] = pos[b,i] - pos[b,j]."""
    return pos[:, :, None, :] - pos[:, None, :, :]


def pairwise_distance(pos: jax.Array, emask: jax.Array) -> jax.Array:
    """Masked pairwise Euclidean distances.

    Entries outside ``emask`` (including the diagonal) are set to 1.0 — a
    harmless dummy that keeps downstream ``1/d`` and ``sqrt`` finite and
    NaN-free under autodiff.  Real entries match
    ``(pos[i]-pos[j]).norm(dim=-1)`` (reference models/geometry.py:18-19).
    """
    diff = pairwise_diff(pos)
    sq = jnp.sum(diff * diff, axis=-1)
    safe_sq = jnp.where(emask, sq, 1.0)
    # sq > 0 wherever emask (no self loops, distinct atoms), but guard anyway:
    safe_sq = jnp.maximum(safe_sq, 1e-24)
    return jnp.where(emask, jnp.sqrt(safe_sq), 1.0)


def eq_transform(
    score_d: jax.Array,
    pos: jax.Array,
    emask: jax.Array,
    edge_length: jax.Array | None = None,
) -> jax.Array:
    """Distance-score -> coordinate-score chain rule (SE(3)-equivariant).

    For each directed edge e=(i,j):  dd_dr = (r_i - r_j) / d_ij, and
    ``score_pos[i] += dd_dr * s_e``, ``score_pos[j] -= dd_dr * s_e``
    (reference models/geometry.py:22-30).  Densely:

        score_pos[i] = sum_j m_ij (r_i - r_j)/d_ij s_ij
                     + sum_j m_ji (r_i - r_j)/d_ji s_ji

    Args:
      score_d: (B, N, N) or (B, N, N, 1) per-pair distance scores.
      pos: (B, N, 3).
      emask: (B, N, N) bool edge mask.
      edge_length: optional precomputed (B, N, N) masked distances.
    Returns:
      (B, N, 3) per-atom score vectors (exactly 0 for padded atoms).
    """
    if score_d.ndim == 4:
        score_d = score_d[..., 0]
    if edge_length is None:
        edge_length = pairwise_distance(pos, emask)

    diff = pairwise_diff(pos)  # (B, N, N, 3), diff[i,j] = r_i - r_j
    dd_dr = diff / edge_length[..., None]

    m = emask.astype(score_d.dtype)
    w_fwd = m * score_d                       # edges (i -> j): + at i
    w_bwd = jnp.swapaxes(m * score_d, 1, 2)   # edges (j -> i): - at j, i.e. + along +diff
    return jnp.sum(dd_dr * (w_fwd + w_bwd)[..., None], axis=2)


def center_pos(pos: jax.Array, node_mask: jax.Array) -> jax.Array:
    """Zero the center of mass of each graph (reference models/sampler.py:260-262),
    counting only real atoms; padded rows are forced to zero."""
    m = node_mask[..., None].astype(pos.dtype)
    count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(pos * m, axis=1, keepdims=True) / count
    return (pos - mean) * m


def clip_norm(vec: jax.Array, limit: float) -> jax.Array:
    """Clip per-atom vector L2 norms to ``limit`` (reference models/sampler.py:265-268)."""
    norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    denom = jnp.where(norm > limit, limit / jnp.maximum(norm, 1e-30), 1.0)
    return vec * denom


def get_angle(pos: jax.Array, angle_index: jax.Array) -> jax.Array:
    """Angles from (3, A) left-center-right index tuples
    (reference models/geometry.py:52-66); host/eval utility."""
    n1, ctr, n2 = angle_index
    v1 = pos[n1] - pos[ctr]
    v2 = pos[n2] - pos[ctr]
    inner = jnp.sum(v1 * v2, axis=-1, keepdims=True)
    lp = jnp.linalg.norm(v1, axis=-1, keepdims=True) * jnp.linalg.norm(
        v2, axis=-1, keepdims=True
    )
    return jnp.arccos(inner / lp)


def get_dihedral(pos: jax.Array, dihedral_index: jax.Array) -> jax.Array:
    """Dihedrals from (4, A) index tuples (reference models/geometry.py:69-86)."""
    n1, c1, c2, n2 = dihedral_index
    v_ctr = pos[c2] - pos[c1]
    v1 = pos[n1] - pos[c1]
    v2 = pos[n2] - pos[c2]
    m1 = jnp.cross(v_ctr, v1)
    m2 = jnp.cross(v_ctr, v2)
    inner = jnp.sum(m1 * m2, axis=-1, keepdims=True)
    lp = jnp.linalg.norm(m1, axis=-1, keepdims=True) * jnp.linalg.norm(
        m2, axis=-1, keepdims=True
    )
    return jnp.arccos(inner / lp)
