"""Custom VJP for the fused SchNet interaction stack — fused training path.

Forward: the fused stack kernel, additionally emitting each block's INPUT
node states ``hs (B, L, N, H)`` (tiny — the only residuals saved).  Backward:
one kernel per graph that recomputes each block's pair-grid intermediates
from (ea, c, hs[l]) in reverse order — flash-attention-style recompute — and
produces input grads plus layer-stacked weight grads accumulated across the
grid (zero-initialized at the first grid step; the constant-index output
blocks stay resident across steps).

The (B, N, N, F) filter activations therefore never touch HBM in either
direction; XLA's autodiff of the unfused formulation stores (or remats) them
for all L blocks.

Gradient notes:
  * ssp'(x) = sigmoid(x);
  * cmask receives zero gradient: in the production (hard-cutoff) model it is
    a boolean cast whose upstream derivative is zero everywhere anyway;
  * weight-gradient accumulation runs in float32.

Verified against jax.grad of ``interaction_stack_xla`` in
tests/test_pallas_vjp.py (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsdiff_tpu.ops.pallas.schnet_stack import _ssp

_W_KEYS = ("f1w", "f1b", "f2w", "f2b", "l1w", "l2w", "l2b", "ow", "ob")


def _sigmoid(x):
    xf = x.astype(jnp.float32)
    return jax.nn.sigmoid(xf)


def _fwd_kernel(
    ea_ref, c_ref, h_ref,
    f1w, f1b, f2w, f2b, l1w, l2w, l2b, ow, ob,
    out_ref, hs_ref,
    *, num_blocks: int, n_nodes: int,
):
    ea = ea_ref[0]
    c = c_ref[0]
    h = h_ref[0]
    n = n_nodes
    dt = h.dtype

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    for l in range(num_blocks):
        hs_ref[0, l] = h  # save block input
        w = _ssp((dot(ea, f1w[l]) + f1b[l]).astype(dt))
        w = (dot(w, f2w[l]) + f2b[l]).astype(dt)
        w = w * c
        xh = dot(h, l1w[l]).astype(dt)
        agg = jnp.sum(w.reshape(n, n, -1) * xh[:, None, :], axis=0)
        conv = (dot(agg, l2w[l]) + l2b[l]).astype(dt)
        h = h + (dot(_ssp(conv), ow[l]) + ob[l]).astype(dt)

    out_ref[0] = h


def _bwd_kernel(
    ea_ref, c_ref, hs_ref, g_ref,
    f1w, f1b, f2w, f2b, l1w, l2w, l2b, ow, ob,
    dh_ref, dea_ref,
    df1w, df1b, df2w, df2b, dl1w, dl2w, dl2b, dow, dob,
    *, num_blocks: int, n_nodes: int,
):
    b = pl.program_id(0)
    n = n_nodes
    ea = ea_ref[0]
    c = c_ref[0]
    dt = ea.dtype

    @pl.when(b == 0)
    def _zero():
        for ref in (df1w, df1b, df2w, df2b, dl1w, dl2w, dl2b, dow, dob):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    def dot(a, x):
        return jnp.dot(a, x, preferred_element_type=jnp.float32)

    g = g_ref[0].astype(jnp.float32)  # dL/dh_out, walked backwards
    dea_acc = jnp.zeros(ea.shape, jnp.float32)

    for l in reversed(range(num_blocks)):
        h_l = hs_ref[0, l]
        # --- recompute forward intermediates of block l ---
        a1 = dot(ea, f1w[l]) + f1b[l]          # (P, F) f32
        s1 = _ssp(a1.astype(dt))
        a2 = dot(s1, f2w[l]) + f2b[l]
        w = a2.astype(dt) * c
        xh = dot(h_l, l1w[l]).astype(dt)       # (N, F)
        w3 = w.reshape(n, n, -1)
        agg = jnp.sum(w3 * xh[:, None, :], axis=0)
        a3 = dot(agg, l2w[l]) + l2b[l]         # (N, H) f32
        s3 = _ssp(a3.astype(dt))

        # --- backward ---
        dow[l] += dot(s3.T, g.astype(dt))
        dob[l] += jnp.sum(g, axis=0, keepdims=True)
        ds3 = dot(g.astype(dt), ow[l].T)
        da3 = ds3 * _sigmoid(a3)               # (N, H) f32
        dl2w[l] += dot(agg.T, da3.astype(dt))
        dl2b[l] += jnp.sum(da3, axis=0, keepdims=True)
        dagg = dot(da3.astype(dt), l2w[l].T)   # (N, F) f32
        dagg = dagg.astype(dt)

        dw3 = xh[:, None, :] * dagg[None, :, :]            # (N, N, F)
        dxh = jnp.sum(w3 * dagg[None, :, :], axis=1)       # (N, F)
        dl1w[l] += dot(h_l.T, dxh)
        dh_from_xh = dot(dxh, l1w[l].T)                    # (N, H) f32

        dw = dw3.reshape(n * n, -1)
        da2 = (dw * c).astype(dt)
        df2w[l] += dot(s1.T, da2)
        df2b[l] += jnp.sum(da2.astype(jnp.float32), axis=0, keepdims=True)
        ds1 = dot(da2, f2w[l].T).astype(dt)
        da1 = ds1 * _sigmoid(a1).astype(dt)
        df1w[l] += dot(ea.T, da1)
        df1b[l] += jnp.sum(da1.astype(jnp.float32), axis=0, keepdims=True)
        dea_acc = dea_acc + dot(da1, f1w[l].T)

        g = g + dh_from_xh  # residual + lin1 path into h_l

    dh_ref[0] = g.astype(dh_ref.dtype)
    dea_ref[0] = dea_acc.astype(dea_ref.dtype)


def _reshape_weights(weights, dtype):
    w = {k: weights[k].astype(dtype) for k in _W_KEYS}
    # stacked biases -> (L, 1, F): dynamic/static layer index on the outer dim
    for k in ("f1b", "f2b", "l2b", "ob"):
        if w[k].ndim == 2:
            w[k] = w[k][:, None, :]
    return w


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def interaction_stack_pallas_trainable(weights, h, edge_attr, cmask, dtype, interpret):
    out, _ = _fwd_impl(weights, h, edge_attr, cmask, dtype, interpret)
    return out


def _specs(B, P, E, N, H, w):
    per_graph = lambda shape: pl.BlockSpec(
        (1, *shape), lambda b: (b, *(0 for _ in shape)), memory_space=pltpu.VMEM
    )
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b: tuple(0 for _ in arr.shape), memory_space=pltpu.VMEM
    )
    return per_graph, full


def _fwd_impl(weights, h, edge_attr, cmask, dtype, interpret):
    B, N, _, E = edge_attr.shape
    H = h.shape[-1]
    L = weights["f1w"].shape[0]
    P = N * N
    ea = edge_attr.reshape(B, P, E).astype(dtype)
    c = cmask.reshape(B, P, 1).astype(dtype)
    hv = h.astype(dtype)
    w = _reshape_weights(weights, dtype)
    per_graph, full = _specs(B, P, E, N, H, w)

    out, hs = pl.pallas_call(
        functools.partial(_fwd_kernel, num_blocks=L, n_nodes=N),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, H), dtype),
            jax.ShapeDtypeStruct((B, L, N, H), dtype),
        ),
        grid=(B,),
        in_specs=[
            per_graph((P, E)), per_graph((P, 1)), per_graph((N, H)),
            *[full(w[k]) for k in _W_KEYS],
        ],
        out_specs=(per_graph((N, H)), per_graph((L, N, H))),
        interpret=interpret,
    )(ea, c, hv, *[w[k] for k in _W_KEYS])
    return out, (weights, h, edge_attr, cmask, hs)


def _fwd_rule(weights, h, edge_attr, cmask, dtype, interpret):
    out, res = _fwd_impl(weights, h, edge_attr, cmask, dtype, interpret)
    return out, res


def _bwd_rule(dtype, interpret, res, g):
    weights, h, edge_attr, cmask, hs = res
    B, N, _, E = edge_attr.shape
    H = h.shape[-1]
    L = weights["f1w"].shape[0]
    P = N * N
    ea = edge_attr.reshape(B, P, E).astype(dtype)
    c = cmask.reshape(B, P, 1).astype(dtype)
    w = _reshape_weights(weights, dtype)
    per_graph, full = _specs(B, P, E, N, H, w)

    F = weights["f1w"].shape[-1]
    grad_shapes = {
        "f1w": (L, E, F), "f1b": (L, 1, F), "f2w": (L, F, F), "f2b": (L, 1, F),
        "l1w": (L, H, F), "l2w": (L, F, H), "l2b": (L, 1, H),
        "ow": (L, H, H), "ob": (L, 1, H),
    }
    full_out = lambda shape: pl.BlockSpec(
        shape, lambda b: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, num_blocks=L, n_nodes=N),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, H), jnp.float32),
            jax.ShapeDtypeStruct((B, P, E), jnp.float32),
            *[jax.ShapeDtypeStruct(grad_shapes[k], jnp.float32) for k in _W_KEYS],
        ),
        grid=(B,),
        in_specs=[
            per_graph((P, E)), per_graph((P, 1)), per_graph((L, N, H)),
            per_graph((N, H)),
            *[full(w[k]) for k in _W_KEYS],
        ],
        out_specs=(
            per_graph((N, H)),
            per_graph((P, E)),
            *[full_out(grad_shapes[k]) for k in _W_KEYS],
        ),
        interpret=interpret,
    )(ea, c, hs, g.astype(dtype), *[w[k] for k in _W_KEYS])

    dh = outs[0].astype(h.dtype)
    dea = outs[1].reshape(B, N, N, E).astype(edge_attr.dtype)
    dws = {}
    for k, arr in zip(_W_KEYS, outs[2:]):
        want = weights[k].shape
        dws[k] = arr.reshape(want).astype(weights[k].dtype)
    return dws, dh, dea, jnp.zeros_like(cmask)


interaction_stack_pallas_trainable.defvjp(_fwd_rule, _bwd_rule)
