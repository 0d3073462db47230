"""SchNet encoder on the dense pair grid — the production GNN.

TPU-native re-design of reference models/encoder/schnet.py (7 interaction
blocks, hidden 256, cutoff 10 A, hard cutoff — configs/train_config.yml:10-17).

The reference CFConv is PyG MessagePassing with ``aggr="add"`` over a dynamic
edge list (torch_scatter under the hood).  Here the continuous-filter
convolution becomes a masked dense contraction on (B, N, N, F):

    W[b,i,j,f] = filter_mlp(edge_attr)[b,i,j,f] * C(d_ij) * edge_mask
    out[b,j,f] = sum_i W[b,i,j,f] * (x @ lin1)[b,i,f]

i.e. messages flow source->target exactly as PyG's default flow.

Parameters are owned directly by the encoder as layer-stacked arrays
(``f1w (L,E,F)`` etc.) so the SAME pytree drives two execution paths:

  * ``interaction_stack_xla`` — jnp einsum formulation (always available,
    differentiable; used for training);
  * ``interaction_stack_pallas`` (ops/pallas/schnet_stack.py) — a fused
    kernel that keeps the (N^2, F) filter activations in VMEM across the
    whole 7-block stack, eliminating ~2 HBM round-trips of a
    (B, N, N, F) tensor per block per step (the sampling hot loop).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tsdiff_tpu.models.activations import shifted_softplus
from tsdiff_tpu.models.mlp import torch_linear_init

xavier_uniform = jax.nn.initializers.glorot_uniform()


def _stacked(init_fn, L):
    """Stack a per-layer initializer along a new leading layer axis."""

    def init(key, shape, dtype=jnp.float32):
        keys = jax.random.split(key, L)
        return jnp.stack([init_fn(k, shape[1:], dtype) for k in keys])

    return init


def _torch_bias(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class SchNetStackParams(nn.Module):
    """Declares the layer-stacked interaction parameters.

    Per block l (reference schnet.py:74-128): filter MLP f1 (E->F) / f2
    (F->F) with torch-default init; CFConv lin1 (H->F, no bias) and lin2
    (F->H, zero bias) with Xavier init (reference schnet.py:85-88); post-conv
    linear out (H->H) with torch-default init.
    """

    num_interactions: int
    hidden_channels: int
    num_filters: int
    edge_channels: int

    @nn.compact
    def __call__(self):
        L, H, F, E = (
            self.num_interactions,
            self.hidden_channels,
            self.num_filters,
            self.edge_channels,
        )
        p = self.param
        return dict(
            f1w=p("f1w", _stacked(torch_linear_init, L), (L, E, F)),
            f1b=p("f1b", _torch_bias(1.0 / E**0.5), (L, F)),
            f2w=p("f2w", _stacked(torch_linear_init, L), (L, F, F)),
            f2b=p("f2b", _torch_bias(1.0 / F**0.5), (L, F)),
            l1w=p("l1w", _stacked(xavier_uniform, L), (L, H, F)),
            l2w=p("l2w", _stacked(xavier_uniform, L), (L, F, H)),
            l2b=p("l2b", jax.nn.initializers.zeros, (L, H)),
            ow=p("ow", _stacked(torch_linear_init, L), (L, H, H)),
            ob=p("ob", _torch_bias(1.0 / H**0.5), (L, H)),
        )


def interaction_stack_xla(
    weights: dict,
    h: jax.Array,          # (B, N, H)
    edge_attr: jax.Array,  # (B, N, N, E)
    cmask: jax.Array,      # (B, N, N) combined cutoff * edge mask (float)
    dtype=jnp.float32,
) -> jax.Array:
    """Residual interaction stack, jnp/einsum formulation."""
    L = weights["f1w"].shape[0]
    c = cmask[..., None].astype(dtype)
    w8 = {k: v.astype(dtype) for k, v in weights.items()}
    for l in range(L):
        w = jnp.dot(edge_attr, w8["f1w"][l]) + w8["f1b"][l]
        w = shifted_softplus(w)
        w = jnp.dot(w, w8["f2w"][l]) + w8["f2b"][l]
        w = w * c
        xh = jnp.dot(h, w8["l1w"][l])
        agg = jnp.einsum("bijf,bif->bjf", w, xh)
        conv = jnp.dot(agg, w8["l2w"][l]) + w8["l2b"][l]
        h = h + (jnp.dot(shifted_softplus(conv), w8["ow"][l]) + w8["ob"][l])
    return h


class SchNetEncoder(nn.Module):
    """Residual stack of interaction blocks (reference schnet.py:131-225)."""

    hidden_channels: int = 128
    num_filters: int = 128
    num_interactions: int = 6
    cutoff: float = 10.0
    smooth: bool = False
    embedding: bool = False  # internal atom embedding (dualenc legacy path)
    edge_channels: int | None = None
    use_pallas: bool = False
    dtype: jax.typing.DTypeLike | None = None

    @classmethod
    def from_config(cls, config, dtype=None) -> "SchNetEncoder":
        """Mirror of reference schnet.py:173-201 (encoder sub-config)."""
        return cls(
            hidden_channels=config.hidden_dim,
            num_filters=config.hidden_dim,
            num_interactions=config.num_convs,
            cutoff=config.cutoff,
            smooth=config.smooth_conv,
            dtype=dtype,
        )

    def cutoff_mask(self, edge_length: jax.Array, emask: jax.Array) -> jax.Array:
        """C(d) * edge mask (reference schnet.py:90-98)."""
        if self.smooth:
            c = 0.5 * (jnp.cos(edge_length * jnp.pi / self.cutoff) + 1.0)
            c = c * (edge_length <= self.cutoff) * (edge_length >= 0.0)
            return c * emask
        return ((edge_length <= self.cutoff) & emask).astype(jnp.float32)

    @nn.compact
    def __call__(
        self,
        z: jax.Array,          # (B, N, H) node states, or (B, N) int atom types
        edge_attr: jax.Array,  # (B, N, N, E)
        edge_length: jax.Array,
        emask: jax.Array,
        node_mask: jax.Array | None = None,
    ) -> jax.Array:
        dt = self.dtype or jnp.float32
        if self.embedding and z.ndim == 2:
            # internal Embedding(100, H, max_norm=10) of the legacy path
            # (reference schnet.py:151-152); torch's max_norm renormalizes
            # looked-up rows to L2 norm <= 10 — functionally a clip at lookup.
            emb = nn.Embed(
                100,
                self.hidden_channels,
                embedding_init=jax.nn.initializers.normal(1.0),
                dtype=self.dtype,
                name="node_emb",
            )(z)
            norm = jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True)
            emb = emb * jnp.minimum(1.0, 10.0 / jnp.maximum(norm, 1e-12)).astype(emb.dtype)
            h = emb
            if node_mask is not None:
                h = h * node_mask[..., None].astype(h.dtype)
        else:
            h = z

        e_ch = self.edge_channels or edge_attr.shape[-1]
        weights = SchNetStackParams(
            self.num_interactions,
            self.hidden_channels,
            self.num_filters,
            e_ch,
            name="stack",
        )()
        cmask = self.cutoff_mask(edge_length, emask)

        if self.use_pallas and not self.is_initializing():
            # differentiable fused kernel (custom VJP with recompute-based
            # backward) — valid for both training and inference
            from tsdiff_tpu.ops.pallas.schnet_stack_vjp import (
                interaction_stack_pallas_trainable,
            )

            return interaction_stack_pallas_trainable(
                weights, h.astype(dt), edge_attr.astype(dt), cmask, dt, False
            )
        return interaction_stack_xla(
            weights, h.astype(dt), edge_attr.astype(dt), cmask, dtype=dt
        )
