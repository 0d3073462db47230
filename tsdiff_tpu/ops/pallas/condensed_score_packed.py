"""Symmetry-packed fused score kernel — Pallas TPU (round-2 fast path).

Every pair tensor of CondenseEncoderEpsNetwork is symmetric in (i, j), so the
dense fused kernel (condensed_score.py) runs each pair MLP twice.  This kernel
operates on OFFSET-packed rows (tsdiff_tpu/core/packed.py): row (k, i) is the
unordered pair {i, (i+k) mod N}, k = 1..N/2 — HALF the rows — and performs

  1. distance MLP  de = MLP(1->H->H)(d)                      (R, H)
  2. bond embeddings IN-KERNEL: one-hot(type) @ table        (R, H)
     (removes the per-step HBM streaming of 4 static (P, H) embedding
     tensors per graph per member)
  3. edge_cat      ea = W1 act(W0r de*er + W0p de*ep + b0) + b1
  4. SchNet stack  L residual blocks; the per-graph CFConv aggregation
     sum_i w[i, j] xh[i] becomes CIRCULAR ROLLS over the node axis:
       agg = sum_k roll(w_k * xh, +k) + w_k * roll(xh, -k)
     (each unordered pair contributes in both directions; the duplicated
     k = N/2 slab carries a 0.5 factor inside the cutoff mask)
  5. head          edge_inv = MLP(2H->H->H/2->1)([h_i*h_j, ea_out])
     with h_i*h_j = h * roll(h, -k) per offset slab

Only distances/masks (XLA, packed layout) and eq_transform_packed stay
outside.  Per-step per-graph HBM traffic: packed d + mask + 4 packed int type
rows + z — the weights and the embedding table are grid-constant.

Numerics match ``score_step`` up to bf16 accumulation (parity-tested in
interpret mode on CPU and on device, tests/test_packed_kernel.py).

Reference semantics being fused: models/epsnet/condensenc.py:156-239 +
encoder/schnet.py:74-128 per sampling step (models/sampler.py:194-209).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsdiff_tpu.ops.pallas.schnet_stack import _ssp
from tsdiff_tpu.ops.pallas.condensed_score import extract_weights, _W_ORDER

VOCAB_PAD = 128  # bond-type embedding table rows, padded for the one-hot matmul


def _silu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _roll(x, shift: int, axis: int, interpret: bool):
    """Circular +shift roll along ``axis`` (jnp.roll semantics: out[j] =
    x[j - shift]).  pltpu.roll is the native sublane rotate; jnp.roll in
    interpret mode."""
    if interpret:
        return jnp.roll(x, shift, axis)
    # pltpu.roll requires a non-negative shift; -k == +(n - k) circularly.
    # Mosaic only rotates 32-bit data — bf16 rolls go through f32 (lossless).
    s = shift % x.shape[axis]
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, s, axis)
    return pltpu.roll(x.astype(jnp.float32), s, axis).astype(x.dtype)


def _score_kernel(
    d_ref,        # (1, R, 1) packed distances (dummy 1.0 off-edge)
    c_ref,        # (1, R, 1) cutoff * encoder edge mask * 0.5-last-slab
    z_ref,        # (1, G*N, H) node states
    tr_in_ref, tp_in_ref, tr_out_ref, tp_out_ref,  # (1, R, 1) int32 bond types
    table_ref,    # (VOCAB_PAD, H) bond embedding table
    dw0_ref, db0_ref, dw1_ref, db1_ref,
    c0r_ref, c0p_ref, c0b_ref, c1w_ref, c1b_ref,
    f1w_ref, f1b_ref, f2w_ref, f2b_ref, l1w_ref, l2w_ref, l2b_ref, ow_ref, ob_ref,
    g0h_ref, g0e_ref, g0b_ref, g1w_ref, g1b_ref, g2w_ref, g2b_ref,
    out_ref,      # (1, R, 1) packed edge_inv (f32)
    *,
    num_blocks: int,
    n_nodes: int,
    graphs_per_step: int,
    interpret: bool,
):
    n = n_nodes
    K = n // 2
    G = graphs_per_step
    R = G * K * n
    h = z_ref[0]          # (G*N, H)
    dt = h.dtype
    d = d_ref[0].astype(dt)
    c = c_ref[0].astype(dt)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def embed(t_ref):
        # one-hot bond embedding: (R,1) int32 == iota(VOCAB_PAD) -> @ table
        t = t_ref[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (R, VOCAB_PAD), 1)
        oh = (t == iota).astype(dt)
        return dot(oh, table_ref[:]).astype(dt)

    # 1. distance MLP; first layer (1 -> H) is an outer product: VPU broadcast
    de = _silu((d * dw0_ref[:] + db0_ref[:]).astype(dt))
    de = (dot(de, dw1_ref[:]) + db1_ref[:]).astype(dt)

    def edge_cat(er, ep):
        v = dot(de * er, c0r_ref[:]) + dot(de * ep, c0p_ref[:]) + c0b_ref[:]
        v = _silu(v.astype(dt))
        return (dot(v, c1w_ref[:]) + c1b_ref[:]).astype(dt)

    ea = edge_cat(embed(tr_in_ref), embed(tp_in_ref))

    # 4. interaction stack with roll-based symmetric aggregation
    def block(l, h):
        w = _ssp((dot(ea, f1w_ref[l]) + f1b_ref[l]).astype(dt))
        w = (dot(w, f2w_ref[l]) + f2b_ref[l]).astype(dt)
        w = w * c                                 # (R, F)
        F = w.shape[-1]
        w4 = w.reshape(G, K, n, F)
        xh = dot(h, l1w_ref[l]).astype(dt).reshape(G, n, F)
        agg = jnp.zeros((G, n, F), jnp.float32)
        for k in range(1, K + 1):
            wk = w4[:, k - 1]                      # (G, N, F)
            agg = agg + _roll(wk * xh, k, 1, interpret).astype(jnp.float32)
            agg = agg + (wk * _roll(xh, -k, 1, interpret)).astype(jnp.float32)
        agg = agg.astype(dt).reshape(G * n, F)
        conv = (dot(agg, l2w_ref[l]) + l2b_ref[l]).astype(dt)
        return h + (dot(_ssp(conv), ow_ref[l]) + ob_ref[l]).astype(dt)

    h = jax.lax.fori_loop(0, num_blocks, block, h)

    # 5. out-stage edge attributes (order-3 types, same de)
    ea_out = edge_cat(embed(tr_out_ref), embed(tp_out_ref))

    # 6. head: hh[(g,k,i)] = h[g,i] * h[g,(i+k)%N]
    H = h.shape[-1]
    h3 = h.reshape(G, n, H)
    hh = jnp.concatenate(
        [(h3 * _roll(h3, -k, 1, interpret))[:, None] for k in range(1, K + 1)],
        axis=1,
    ).reshape(R, H)
    g = dot(hh, g0h_ref[:]) + dot(ea_out, g0e_ref[:]) + g0b_ref[:]
    g = _silu(g.astype(dt))
    g = _silu((dot(g, g1w_ref[:]) + g1b_ref[:]).astype(dt))
    out_ref[0] = (dot(g, g2w_ref[:]) + g2b_ref[:]).astype(jnp.float32)


def extract_weights_packed(variables: dict) -> dict:
    """Kernel weights: the dense-kernel extraction plus the (padded) bond
    embedding table consumed by the in-kernel one-hot lookup."""
    w = extract_weights(variables)
    p = variables["params"] if "params" in variables else variables
    table = p["edge_enc"]["bond_emb"]["embedding"]
    v, h = table.shape
    assert v <= VOCAB_PAD, f"bond vocab {v} exceeds {VOCAB_PAD}"
    w["table"] = jnp.zeros((VOCAB_PAD, h), table.dtype).at[:v].set(table)
    return w


@functools.partial(
    jax.jit,
    static_argnames=("num_blocks", "dtype", "interpret", "graphs_per_step"),
)
def packed_score_pallas(
    weights: dict,        # extract_weights_packed output
    z: jax.Array,         # (B, N, H)
    d: jax.Array,         # (B, K, N) masked packed distances (f32)
    cmask: jax.Array,     # (B, K, N) float: cutoff & encoder mask & 0.5-slab
    type_r_in: jax.Array,   # (B, K, N) int32
    type_p_in: jax.Array,
    type_r_out: jax.Array,
    type_p_out: jax.Array,
    num_blocks: int,
    dtype=jnp.float32,
    interpret: bool = False,
    graphs_per_step: int | None = None,
) -> jax.Array:
    """Returns packed edge_inv (B, K, N) float32."""
    B, K, N = d.shape
    H = z.shape[-1]
    P = K * N
    if graphs_per_step is None:
        # rows-per-grid-step sweet spot, measured on v5e (N=24: G=10 6.11ms
        # vs G=4 6.38 / G=20 6.38; N=16: G=25 2.74ms vs G=10 2.79); small
        # buckets (N=8: 32 rows/graph) want much larger G
        graphs_per_step = max(
            (g for g in (100, 50, 25, 20, 10, 8, 6, 5, 4, 3, 2, 1) if g * P <= 3300),
            default=1,
        )
    G = graphs_per_step
    while B % G != 0:
        G -= 1
    BG = B // G
    R = G * P

    dv = d.reshape(BG, R, 1).astype(jnp.float32)
    cv = cmask.reshape(BG, R, 1).astype(jnp.float32)
    zv = z.reshape(BG, G * N, H).astype(dtype)
    types = [
        t.reshape(BG, R, 1).astype(jnp.int32)
        for t in (type_r_in, type_p_in, type_r_out, type_p_out)
    ]
    w = {k: weights[k].astype(dtype) for k in _W_ORDER}
    w["table"] = weights["table"].astype(dtype)
    # single-layer biases -> (1, F) rows; layer-stacked -> (L, 1, F) so the
    # fori_loop's dynamic index lands on an untiled dim (see condensed_score)
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
    flops = 2 * B * P * (
        H * H                      # distance MLP second layer
        + 4 * VOCAB_PAD * H        # one-hot embeddings
        + 2 * 3 * H * H            # two edge_cat stages
        + num_blocks * (H * F + F * F)
        + 2 * H * H + H * (H // 2)
    ) + 2 * B * num_blocks * N * (H * F + F * H + H * H)
    bytes_accessed = (dv.size + cv.size) * 4 + zv.size * 2 + sum(t.size for t in types) * 4

    kernel = functools.partial(
        _score_kernel,
        num_blocks=num_blocks,
        n_nodes=N,
        graphs_per_step=G,
        interpret=interpret,
    )
    w_order = ("table",) + _W_ORDER
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BG, R, 1), jnp.float32),
        grid=(BG,),
        in_specs=[
            per_graph((R, 1)),
            per_graph((R, 1)),
            per_graph((G * N, H)),
            *[per_graph((R, 1)) for _ in range(4)],
            *[full(w[k]) for k in w_order],
        ],
        out_specs=per_graph((R, 1)),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=bytes_accessed,
            transcendentals=B * (num_blocks + 4) * P * H,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # grid steps are independent graphs: lets Mosaic overlap steps
            # (measured: N=24 6.11 -> 5.97 ms, N=16 neutral; vmem 127MB
            # regresses slightly)
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(dv, cv, zv, *types, *[w[k] for k in w_order])
    return out.reshape(B, K, N)
