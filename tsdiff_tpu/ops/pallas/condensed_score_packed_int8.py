"""Int8-quantized variant of the symmetry-packed fused score kernel.

Same program as ops/pallas/condensed_score_packed.py (offset-packed pair
rows, roll-based symmetric CFConv aggregation, in-kernel bond embeddings) with
the PAIR-ROW matmuls — the dominant FLOPs at the N=24 bucket — executed on the
MXU in int8 (v5e: 2x the bf16 MAC rate):

  * weights: symmetric per-tensor int8 (per-LAYER for the stacked interaction
    filters), scales computed at extraction time in XLA;
  * activations: dynamic symmetric per-ROW int8 (row = one unordered pair),
    quantized in-kernel on the VPU; loop-invariant activations (the edge_cat
    output feeding all L interaction blocks, the out-stage edge attributes)
    are quantized once;
  * accumulation: int32 on the MXU, dequantized to f32 by ``s_row * s_w``
    before the bias add (guide: "Patterns: Quantization Kernels").

Kept in bf16/f32 (negligible FLOPs or precision-critical):
  * the distance-MLP first layer (1 -> H outer product, VPU);
  * the per-NODE matmuls (l1w / l2w / ow: N rows vs K*N pair rows);
  * the roll aggregation (VPU) and the residual node stream h;
  * the final head layer g2w (H/2 -> 1) producing edge_inv.

Quality gate: the end-to-end learning gate's sampled D-MAE must match the
bf16 path within noise (tests/test_learning_sanity.py with score_quant;
BENCH_NOTES.md records the outcome).

Reference semantics being fused: models/epsnet/condensenc.py:156-239 +
encoder/schnet.py:74-128 per sampling step (models/sampler.py:194-209).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsdiff_tpu.ops.pallas.condensed_score import _W_ORDER
from tsdiff_tpu.ops.pallas.condensed_score_packed import (
    VOCAB_PAD,
    _roll,
    _silu,
    extract_weights_packed,
)
from tsdiff_tpu.ops.pallas.schnet_stack import _ssp

#: per-tensor-quantized weights, in the order their scales occupy the packed
#: (1, len) f32 scales operand
_SCALED = ("dw1", "c0r", "c0p", "c1w", "g0h", "g0e", "g1w", "table")


def _quant_tensor(w, axes):
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=axes, keepdims=False), 1e-12) / 127.0
    q = jnp.round(wf / s.reshape(s.shape + (1,) * len(axes))).astype(jnp.int8)
    return q, s


def extract_weights_packed_int8(variables: dict) -> dict:
    """``extract_weights_packed`` plus int8 quantization of the pair-row
    matmul weights: quantized tensors replace the originals; scales ride in
    ``scales`` (1, 8) f32 (order ``_SCALED``) and ``f1w_s``/``f2w_s``
    (L, 1, 1) f32 per-layer."""
    w = dict(extract_weights_packed(variables))
    scales = []
    for k in _SCALED:
        q, s = _quant_tensor(w[k], axes=tuple(range(w[k].ndim)))
        w[k], _ = q, None
        scales.append(s)
    w["scales"] = jnp.stack(scales).reshape(1, len(_SCALED))
    for k in ("f1w", "f2w"):
        q, s = _quant_tensor(w[k], axes=(1, 2))  # (L, in, out) -> per-layer
        w[k] = q
        w[k + "_s"] = s.reshape(-1, 1, 1)
    return w


def _q8_rows(x):
    """Dynamic symmetric per-row int8: (R, C) -> ((R, C) int8, (R, 1) f32)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    return jnp.round(xf / s).astype(jnp.int8), s


def _score_kernel_int8(
    d_ref, c_ref, z_ref,
    tr_in_ref, tp_in_ref, tr_out_ref, tp_out_ref,
    scales_ref,   # (1, len(_SCALED)) f32
    f1s_ref, f2s_ref,  # (L, 1, 1) f32
    table_ref,    # (VOCAB_PAD, H) int8
    dw0_ref, db0_ref, dw1_ref, db1_ref,
    c0r_ref, c0p_ref, c0b_ref, c1w_ref, c1b_ref,
    f1w_ref, f1b_ref, f2w_ref, f2b_ref, l1w_ref, l2w_ref, l2b_ref, ow_ref, ob_ref,
    g0h_ref, g0e_ref, g0b_ref, g1w_ref, g1b_ref, g2w_ref, g2b_ref,
    out_ref,
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

    S = {k: scales_ref[0, i] for i, k in enumerate(_SCALED)}

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def dot8(aq, s_row, wq, s_w):
        acc = jnp.dot(aq, wq, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (s_row * s_w)

    def embed(t_ref):
        # one-hot is EXACT int8; the int32 accumulation selects a quantized
        # table row, dequantized by the table scale alone
        t = t_ref[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (R, VOCAB_PAD), 1)
        oh = (t == iota).astype(jnp.int8)
        acc = jnp.dot(oh, table_ref[:], preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * S["table"]).astype(dt)

    # 1. distance MLP; the 1 -> H layer stays a VPU outer product
    de = _silu((d * dw0_ref[:] + db0_ref[:]).astype(dt))
    de = (dot8(*_q8_rows(de), dw1_ref[:], S["dw1"]) + db1_ref[:]).astype(dt)

    def edge_cat(er, ep):
        v = (
            dot8(*_q8_rows(de * er), c0r_ref[:], S["c0r"])
            + dot8(*_q8_rows(de * ep), c0p_ref[:], S["c0p"])
            + c0b_ref[:]
        )
        v = _silu(v.astype(dt))
        return (dot8(*_q8_rows(v), c1w_ref[:], S["c1w"]) + c1b_ref[:]).astype(dt)

    ea = edge_cat(embed(tr_in_ref), embed(tp_in_ref))
    ea_q, ea_s = _q8_rows(ea)  # feeds every interaction block: quantize once

    def block(l, h):
        w = _ssp((dot8(ea_q, ea_s, f1w_ref[l], f1s_ref[l, 0, 0]) + f1b_ref[l]).astype(dt))
        w = (dot8(*_q8_rows(w), f2w_ref[l], f2s_ref[l, 0, 0]) + f2b_ref[l]).astype(dt)
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

    ea_out = edge_cat(embed(tr_out_ref), embed(tp_out_ref))

    H = h.shape[-1]
    h3 = h.reshape(G, n, H)
    hh = jnp.concatenate(
        [(h3 * _roll(h3, -k, 1, interpret))[:, None] for k in range(1, K + 1)],
        axis=1,
    ).reshape(R, H)
    g = (
        dot8(*_q8_rows(hh), g0h_ref[:], S["g0h"])
        + dot8(*_q8_rows(ea_out), g0e_ref[:], S["g0e"])
        + g0b_ref[:]
    )
    g = _silu(g.astype(dt))
    g = _silu((dot8(*_q8_rows(g), g1w_ref[:], S["g1w"]) + g1b_ref[:]).astype(dt))
    # final H/2 -> 1 stays bf16: tiny FLOPs, precision-critical output
    out_ref[0] = (dot(g, g2w_ref[:]) + g2b_ref[:]).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("num_blocks", "dtype", "interpret", "graphs_per_step"),
)
def packed_score_pallas_int8(
    weights: dict,        # extract_weights_packed_int8 output
    z: jax.Array,         # (B, N, H)
    d: jax.Array,         # (B, K, N) masked packed distances (f32)
    cmask: jax.Array,     # (B, K, N) float: cutoff & encoder mask & 0.5-slab
    type_r_in: jax.Array,
    type_p_in: jax.Array,
    type_r_out: jax.Array,
    type_p_out: jax.Array,
    num_blocks: int,
    dtype=jnp.float32,
    interpret: bool = False,
    graphs_per_step: int | None = None,
) -> jax.Array:
    """Returns packed edge_inv (B, K, N) float32 (int8 pair matmuls)."""
    B, K, N = d.shape
    H = z.shape[-1]
    P = K * N
    if graphs_per_step is None:
        # same rows-per-grid-step ladder as the bf16 kernel; int8 tiles are
        # (32, 128) so R = G*P stays a multiple of 32 for every ladder entry
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
    quant_keys = set(_SCALED) | {"f1w", "f2w"}
    w = {
        k: weights[k] if k in quant_keys else weights[k].astype(dtype)
        for k in _W_ORDER
    }
    w["table"] = weights["table"]
    for k in ("scales", "f1w_s", "f2w_s"):
        w[k] = weights[k].astype(jnp.float32)
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
        H * H
        + 4 * VOCAB_PAD * H
        + 2 * 3 * H * H
        + num_blocks * (H * F + F * F)
        + 2 * H * H + H * (H // 2)
    ) + 2 * B * num_blocks * N * (H * F + F * H + H * H)
    bytes_accessed = (dv.size + cv.size) * 4 + zv.size * 2 + sum(t.size for t in types) * 4

    kernel = functools.partial(
        _score_kernel_int8,
        num_blocks=num_blocks,
        n_nodes=N,
        graphs_per_step=G,
        interpret=interpret,
    )
    w_order = ("scales", "f1w_s", "f2w_s", "table") + _W_ORDER
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
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(dv, cv, zv, *types, *[w[k] for k in w_order])
    return out.reshape(B, K, N)
