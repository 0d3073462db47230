"""Fully-fused condensed score-step kernel — Pallas TPU.

Extends the fused interaction stack (schnet_stack.py) to the ENTIRE
position-dependent forward of CondenseEncoderEpsNetwork (score_step): per
(graph) grid step, with everything VMEM-resident:

  1. distance MLP  d_emb = MLP(1->H->H)(d)                 (P, H)
  2. R/P combine   attr_s = d_emb * emb_s (cached statics) (P, H)
  3. edge_cat      ea = W1 act(W0a attr_r + W0b attr_p + b0) + b1
  4. SchNet stack  L residual interaction blocks           (N, H)
  5. out-stage     ea_out from the order-3 static embeddings
  6. head          edge_inv = MLP(2H->H->H/2->1)([h_i h_j, ea_out])

Only the pairwise distances / masks (cheap f32 ops) and eq_transform stay in
XLA.  The per-step HBM traffic collapses to: static bond embeddings (4 x
(P,H) per graph) + distances + weights-once-per-member + the (P,1) output.

Numerics match ``score_step`` up to bf16 accumulation (parity-tested in
interpret mode and on device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsdiff_tpu.ops.pallas.schnet_stack import _ssp


def _silu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _score_kernel(
    d_ref,        # (1, P, 1)  distances (dummy 1.0 off-edge)
    cin_ref,      # (1, P, 1)  cutoff * emask_in  (stack message mask)
    z_ref,        # (1, N, H)  node states
    er_in_ref, ep_in_ref,    # (1, P, H) static bond embeddings, encoder order
    er_out_ref, ep_out_ref,  # (1, P, H) output order
    # distance-MLP weights: MLP(1 -> H -> H), act between
    dw0_ref, db0_ref, dw1_ref, db1_ref,
    # edge_cat: lin0 (2H -> H) split into r/p halves, lin1 (H -> H)
    c0r_ref, c0p_ref, c0b_ref, c1w_ref, c1b_ref,
    # interaction stack (L-stacked)
    f1w_ref, f1b_ref, f2w_ref, f2b_ref, l1w_ref, l2w_ref, l2b_ref, ow_ref, ob_ref,
    # head grad_dist_mlp: (2H -> H) split, (H -> H/2), (H/2 -> 1)
    g0h_ref, g0e_ref, g0b_ref, g1w_ref, g1b_ref, g2w_ref, g2b_ref,
    out_ref,      # (1, G*P, 1) edge_inv (f32)
    *,
    num_blocks: int,
    n_nodes: int,
    graphs_per_step: int,
):
    n = n_nodes
    gps = graphs_per_step
    d = d_ref[0]
    c = cin_ref[0]
    h = z_ref[0]   # (G*N, H)
    dt = h.dtype

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    # 1. distance MLP (act = swish, reference MLPEdgeEncoder)
    de = _silu((dot(d, dw0_ref[:]) + db0_ref[:]).astype(dt))
    de = (dot(de, dw1_ref[:]) + db1_ref[:]).astype(dt)

    def edge_cat(er_ref, ep_ref):
        attr_r = de * er_ref[0]
        attr_p = de * ep_ref[0]
        v = dot(attr_r, c0r_ref[:]) + dot(attr_p, c0p_ref[:]) + c0b_ref[:]
        v = _silu(v.astype(dt))
        return (dot(v, c1w_ref[:]) + c1b_ref[:]).astype(dt)

    ea = edge_cat(er_in_ref, ep_in_ref)

    # 4. interaction stack (same math as schnet_stack._stack_kernel).
    # fori_loop with dynamic weight-slab indexing keeps the Mosaic program
    # small (the fully-unrolled variant compiled ~10x slower remotely).
    def block(l, h):
        w = _ssp((dot(ea, f1w_ref[l]) + f1b_ref[l]).astype(dt))
        w = (dot(w, f2w_ref[l]) + f2b_ref[l]).astype(dt)
        w = w * c
        xh = dot(h, l1w_ref[l]).astype(dt)
        # per-graph aggregation: rows are grouped [graph, i] x [graph, j]
        w4 = w.reshape(gps, n, n, -1)
        xh4 = xh.reshape(gps, n, -1)
        agg = jnp.sum(w4 * xh4[:, :, None, :], axis=1).reshape(gps * n, -1)
        conv = (dot(agg, l2w_ref[l]) + l2b_ref[l]).astype(dt)
        return h + (dot(_ssp(conv), ow_ref[l]) + ob_ref[l]).astype(dt)

    h = jax.lax.fori_loop(0, num_blocks, block, h)

    # 5. out-stage edge attributes (order-3 statics, same d_emb)
    ea_out = edge_cat(er_out_ref, ep_out_ref)

    # 6. head on h_pair = [h_i * h_j, ea_out] (outer products per graph)
    h4 = h.reshape(gps, n, -1)
    hh = (h4[:, :, None, :] * h4[:, None, :, :]).reshape(gps * n * n, -1)
    g = dot(hh, g0h_ref[:]) + dot(ea_out, g0e_ref[:]) + g0b_ref[:]
    g = _silu(g.astype(dt))
    g = _silu((dot(g, g1w_ref[:]) + g1b_ref[:]).astype(dt))
    out_ref[0] = (dot(g, g2w_ref[:]) + g2b_ref[:]).astype(jnp.float32)


def extract_weights(variables: dict) -> dict:
    """Raw weight arrays for the kernel from a CondenseEncoderEpsNetwork
    params pytree (``variables['params']``)."""
    p = variables["params"] if "params" in variables else variables
    mlp = p["edge_enc"]["mlp"]
    cat = p["edge_cat"]
    stack = p["encoder"]["stack"]
    head = p["grad_dist_mlp"]

    def dense(d):
        return d["Dense_0"]["kernel"], d["Dense_0"]["bias"]

    dw0, db0 = dense(mlp["layers_0"])
    dw1, db1 = dense(mlp["layers_1"])
    c0w, c0b = dense(cat["lin0"])
    c1w, c1b = dense(cat["lin1"])
    g0w, g0b = dense(head["layers_0"])
    g1w, g1b = dense(head["layers_1"])
    g2w, g2b = dense(head["layers_2"])
    H = c0w.shape[1]
    return dict(
        dw0=dw0, db0=db0, dw1=dw1, db1=db1,
        c0r=c0w[:H], c0p=c0w[H:], c0b=c0b, c1w=c1w, c1b=c1b,
        f1w=stack["f1w"], f1b=stack["f1b"], f2w=stack["f2w"], f2b=stack["f2b"],
        l1w=stack["l1w"], l2w=stack["l2w"], l2b=stack["l2b"],
        ow=stack["ow"], ob=stack["ob"],
        g0h=g0w[:H], g0e=g0w[H:], g0b=g0b, g1w=g1w, g1b=g1b, g2w=g2w, g2b=g2b,
    )


_W_ORDER = (
    "dw0", "db0", "dw1", "db1",
    "c0r", "c0p", "c0b", "c1w", "c1b",
    "f1w", "f1b", "f2w", "f2b", "l1w", "l2w", "l2b", "ow", "ob",
    "g0h", "g0e", "g0b", "g1w", "g1b", "g2w", "g2b",
)


@functools.partial(
    jax.jit, static_argnames=("num_blocks", "dtype", "interpret", "graphs_per_step")
)
def condensed_score_pallas(
    weights: dict,
    z: jax.Array,        # (B, N, H)
    d: jax.Array,        # (B, N, N) masked distances (f32)
    cmask_in: jax.Array,  # (B, N, N) cutoff * encoder edge mask (float)
    emb_r_in: jax.Array,  # (B, N, N, H)
    emb_p_in: jax.Array,
    emb_r_out: jax.Array,
    emb_p_out: jax.Array,
    num_blocks: int,
    dtype=jnp.float32,
    interpret: bool = False,
    graphs_per_step: int | None = None,
) -> jax.Array:
    """Returns edge_inv (B, N, N, 1) float32.

    ``graphs_per_step`` packs G graphs into each grid step: fewer grid
    iterations (less fixed per-step overhead) and larger matmuls; per-graph
    ops (aggregation, pair outer products) are regrouped in-kernel.
    Default: largest G with ~<=2900 pair rows per step (see inline note).
    """
    B, N, _, H = emb_r_in.shape
    P = N * N
    if graphs_per_step is None:
        # sweet spot ~2-3k pair rows per grid step (measured at N=24:
        # G=2 -> 10.9 ms, G=4 -> 10.4, G=5 -> 10.2, G=10 -> 10.7 per
        # sampling step); needs the raised vmem_limit_bytes below
        graphs_per_step = max(
            (g for g in (8, 6, 5, 4, 3, 2, 1) if g * P <= 2900), default=1
        )
    G = graphs_per_step
    while B % G != 0:  # static fallback for odd batch sizes
        G -= 1
    BG = B // G

    dv = d.reshape(BG, G * P, 1).astype(dtype)
    cv = cmask_in.reshape(BG, G * P, 1).astype(dtype)
    zv = z.reshape(BG, G * N, -1).astype(dtype)
    embs = [
        e.reshape(BG, G * P, H).astype(dtype)
        for e in (emb_r_in, emb_p_in, emb_r_out, emb_p_out)
    ]
    w = {k: weights[k].astype(dtype) for k in _W_ORDER}
    # biases: single-layer ones become (1, F) rows; layer-STACKED ones become
    # (L, 1, F) so the fori_loop's dynamic index lands on the outer
    # (untiled) dim — Mosaic cannot prove alignment of a dynamic sublane
    # index on a (L, F) array ("index in dimension 1 is a multiple of 8").
    for k in ("db0", "db1", "c0b", "c1b", "g0b", "g1b", "g2b"):
        if w[k].ndim == 1:
            w[k] = w[k][None, :]
    for k in ("f1b", "f2b", "l2b", "ob"):
        if w[k].ndim == 2:
            w[k] = w[k][:, None, :]

    per_graph = lambda shape: pl.BlockSpec(
        (1, *shape), lambda b: (b, *(0 for _ in shape)), memory_space=pltpu.VMEM
    )
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b: tuple(0 for _ in arr.shape), memory_space=pltpu.VMEM
    )

    F = w["f1w"].shape[-1]
    flops = 2 * B * (
        P * H * H * 5  # d-mlp L2 + 2x edge_cat (split counts 2) per stage approx
        + num_blocks * (P * H * F + P * F * F + N * H * F + N * F * H + N * H * H)
        + P * (2 * H * H + H * (H // 2))
    )
    bytes_accessed = (dv.size + cv.size + zv.size + 4 * embs[0].size) * 4

    kernel = functools.partial(
        _score_kernel, num_blocks=num_blocks, n_nodes=N, graphs_per_step=G
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BG, G * P, 1), jnp.float32),
        grid=(BG,),
        in_specs=[
            per_graph((G * P, 1)),
            per_graph((G * P, 1)),
            per_graph((G * N, H)),
            *[per_graph((G * P, H)) for _ in range(4)],
            *[full(w[k]) for k in _W_ORDER],
        ],
        out_specs=per_graph((G * P, 1)),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=B * (num_blocks + 4) * P * H,
        ),
        # the default 16 MB scoped-VMEM budget is conservative (v5e has
        # 128 MB); Mosaic's accounting also grows with grid length, so larger
        # batches OOM the default even with identical block shapes
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(dv, cv, zv, *embs, *[w[k] for k in _W_ORDER])
    return out.reshape(B, N, N, 1)
