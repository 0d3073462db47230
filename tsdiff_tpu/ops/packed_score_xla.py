"""Differentiable XLA twin of the packed Pallas score kernel.

Same math as ops/pallas/condensed_score_packed.py — offset-packed pair rows,
roll-based symmetric CFConv aggregation — expressed in plain jnp so that

  * TRAINING gets the 2x pair-FLOP cut too (jnp.roll has a gradient; the
    Pallas kernel is inference-only), and
  * the kernel has an independent same-layout oracle for tests.

Bond embeddings here are direct ``table[types]`` gathers (XLA handles the
gather + its scatter-add gradient fine; the one-hot matmul trick is only
needed inside Mosaic).

Reference semantics: models/epsnet/condensenc.py:156-239 +
encoder/schnet.py:74-128, on packed (B, K, N) pair rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _silu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _ssp(x):
    xf = x.astype(jnp.float32)
    out = jnp.maximum(xf, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(xf))) - jnp.log(2.0)
    return out.astype(x.dtype)


def packed_score_xla(
    weights: dict,        # extract_weights_packed output (original dtypes)
    z: jax.Array,         # (B, N, H)
    d: jax.Array,         # (B, K, N) masked packed distances
    cmask: jax.Array,     # (B, K, N) float cutoff & encoder mask & 0.5-slab
    type_r_in: jax.Array,   # (B, K, N) int32
    type_p_in: jax.Array,
    type_r_out: jax.Array,
    type_p_out: jax.Array,
    num_blocks: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Packed edge_inv (B, K, N) float32; differentiable w.r.t. ``weights``/``z``."""
    B, K, N = d.shape
    w = {k: v.astype(dtype) for k, v in weights.items()}
    h = z.astype(dtype)
    dv = d[..., None].astype(dtype)            # (B, K, N, 1)
    c = cmask[..., None].astype(dtype)
    table = w["table"]

    de = _silu(dv * w["dw0"][0] + w["db0"])
    de = de @ w["dw1"] + w["db1"]              # (B, K, N, H)

    def edge_cat(tr, tp):
        er = jnp.take(table, tr, axis=0)
        ep = jnp.take(table, tp, axis=0)
        v = _silu((de * er) @ w["c0r"] + (de * ep) @ w["c0p"] + w["c0b"])
        return v @ w["c1w"] + w["c1b"]

    ea = edge_cat(type_r_in, type_p_in)

    for l in range(num_blocks):
        f = _ssp(ea @ w["f1w"][l] + w["f1b"][l])
        f = (f @ w["f2w"][l] + w["f2b"][l]) * c            # (B, K, N, F)
        xh = h @ w["l1w"][l]                               # (B, N, F)
        agg = jnp.zeros_like(xh, dtype=jnp.float32)
        for k in range(1, K + 1):
            fk = f[:, k - 1]
            agg = agg + jnp.roll(fk * xh, k, axis=1).astype(jnp.float32)
            agg = agg + (fk * jnp.roll(xh, -k, axis=1)).astype(jnp.float32)
        conv = agg.astype(dtype) @ w["l2w"][l] + w["l2b"][l]
        h = h + _ssp(conv) @ w["ow"][l] + w["ob"][l]

    ea_out = edge_cat(type_r_out, type_p_out)

    hh = jnp.stack(
        [h * jnp.roll(h, -k, axis=1) for k in range(1, K + 1)], axis=1
    )                                                      # (B, K, N, H)
    g = _silu(hh @ w["g0h"] + ea_out @ w["g0e"] + w["g0b"])
    g = _silu(g @ w["g1w"] + w["g1b"])
    return (g @ w["g2w"] + w["g2b"])[..., 0].astype(jnp.float32)
