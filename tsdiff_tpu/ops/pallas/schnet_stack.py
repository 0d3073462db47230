"""Fused SchNet interaction stack — Pallas TPU kernel.

The sampling hot loop spends most of its time in the 7-block interaction
stack: per block, a 2-layer filter MLP over all N^2 pairs (two
(B*N^2, F) x (F, F) matmuls), a masked per-feature aggregation, and two node
matmuls.  Under XLA each block writes its (B, N, N, F) filter activations to
HBM twice and reads them back — the dominant memory traffic of the step.

This kernel runs the ENTIRE L-block stack for one graph per grid step with
everything resident in VMEM:

  * grid = (B,); per step the graph's (N^2, E) edge attributes, (N^2, 1)
    cutoff mask and (N, H) node states are block-fetched;
  * all layer-stacked weights use constant index maps, so Pallas's revolving
    buffers fetch them from HBM once and reuse them across the whole grid
    (and jax.vmap over ensemble members just prepends a grid axis);
  * per block: filter MLP (MXU, f32 accumulation), shifted-softplus (VPU),
    mask multiply, aggregation as an (N, N, F) reduce over sources, node
    matmuls, residual update — all without leaving VMEM.

HBM traffic per step drops to: edge_attr read once + weights once (per
member) + node states — ~10x less than the unfused stack.

Semantics match ``interaction_stack_xla`` exactly (same op order and
accumulation dtypes); see tests/test_pallas_schnet.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2 = 0.6931471805599453


def _ssp(x: jax.Array) -> jax.Array:
    """shifted_softplus with an explicitly stable f32 formulation.

    jax.nn.softplus lowers with NaN-propagation comparisons that Mosaic does
    not support on bf16 vectors ("Target does not support this comparison");
    max(x,0) + log1p(exp(-|x|)) is the same stable softplus without them, and
    evaluating in f32 matches the XLA path's accumulation behavior.
    """
    xf = x.astype(jnp.float32)
    out = jnp.maximum(xf, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(xf))) - _LOG2
    return out.astype(x.dtype)


def _stack_kernel(
    ea_ref,    # (1, P, E)   pair features of this graph
    c_ref,     # (1, P, 1)   cutoff * edge mask
    h_ref,     # (1, N, H)   node states
    f1w_ref, f1b_ref, f2w_ref, f2b_ref,   # (L, E, F), (L, F), (L, F, F), (L, F)
    l1w_ref, l2w_ref, l2b_ref,            # (L, H, F), (L, F, H), (L, H)
    ow_ref, ob_ref,                       # (L, H, H), (L, H)
    out_ref,   # (1, N, H)
    *,
    num_blocks: int,
    n_nodes: int,
):
    ea = ea_ref[0]          # (P, E)
    c = c_ref[0]            # (P, 1)
    h = h_ref[0]            # (N, H)
    n = n_nodes

    for l in range(num_blocks):  # static unroll
        w = (
            jnp.dot(ea, f1w_ref[l], preferred_element_type=jnp.float32)
            + f1b_ref[l]
        ).astype(ea.dtype)
        w = _ssp(w)
        w = (
            jnp.dot(w, f2w_ref[l], preferred_element_type=jnp.float32)
            + f2b_ref[l]
        ).astype(ea.dtype)
        w = w * c  # (P, F)

        xh = jnp.dot(h, l1w_ref[l], preferred_element_type=jnp.float32).astype(
            h.dtype
        )  # (N, F)
        # aggregation at target j: agg[j, f] = sum_i w[i*N + j, f] * xh[i, f]
        w3 = w.reshape(n, n, -1)
        agg = jnp.sum(w3 * xh[:, None, :], axis=0)  # (N, F)

        conv = (
            jnp.dot(agg, l2w_ref[l], preferred_element_type=jnp.float32)
            + l2b_ref[l]
        ).astype(h.dtype)
        block = (
            jnp.dot(_ssp(conv), ow_ref[l], preferred_element_type=jnp.float32)
            + ob_ref[l]
        ).astype(h.dtype)
        h = h + block

    out_ref[0] = h


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def interaction_stack_pallas(
    weights: dict,
    h: jax.Array,          # (B, N, H)
    edge_attr: jax.Array,  # (B, N, N, E)
    cmask: jax.Array,      # (B, N, N)
    dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    B, N, _, E = edge_attr.shape
    H = h.shape[-1]
    L, _, F = weights["f1w"].shape
    P = N * N

    ea = edge_attr.reshape(B, P, E).astype(dtype)
    c = cmask.reshape(B, P, 1).astype(dtype)
    h = h.astype(dtype)
    w = {k: v.astype(dtype) for k, v in weights.items()}

    grid = (B,)
    per_graph = lambda shape: pl.BlockSpec(
        (1, *shape), lambda b: (b, *(0 for _ in shape)), memory_space=pltpu.VMEM
    )
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b: tuple(0 for _ in arr.shape), memory_space=pltpu.VMEM
    )

    flops = 2 * B * L * (P * E * F + P * F * F + N * H * F + N * F * H + N * H * H)
    bytes_accessed = (
        ea.size + c.size + 2 * h.size + sum(x.size for x in w.values())
    ) * ea.dtype.itemsize

    out = pl.pallas_call(
        functools.partial(_stack_kernel, num_blocks=L, n_nodes=N),
        out_shape=jax.ShapeDtypeStruct((B, N, H), dtype),
        grid=grid,
        in_specs=[
            per_graph((P, E)),
            per_graph((P, 1)),
            per_graph((N, H)),
            full(w["f1w"]), full(w["f1b"]), full(w["f2w"]), full(w["f2b"]),
            full(w["l1w"]), full(w["l2w"]), full(w["l2b"]),
            full(w["ow"]), full(w["ob"]),
        ],
        out_specs=per_graph((N, H)),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=B * L * P * F
        ),
        interpret=interpret,
    )(ea, c, h, w["f1w"], w["f1b"], w["f2w"], w["f2b"], w["l1w"], w["l2w"], w["l2b"], w["ow"], w["ob"])
    return out
