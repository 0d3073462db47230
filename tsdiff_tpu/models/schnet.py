"""SchNet encoder on the dense pair grid — the production GNN.

TPU-native re-design of reference models/encoder/schnet.py (7 interaction
blocks, hidden 256, cutoff 10 A, hard cutoff — configs/train_config.yml:10-17).

The reference CFConv is PyG MessagePassing with ``aggr="add"`` over a dynamic
edge list (torch_scatter under the hood).  Here the continuous-filter
convolution becomes a masked dense contraction on (B, N, N, F):

    W[b,i,j,f] = filter_mlp(edge_attr)[b,i,j,f] * C(d_ij) * edge_mask
    out[b,j,f] = sum_i W[b,i,j,f] * (x @ lin1)[b,i,f]

i.e. messages flow source->target exactly as PyG's default flow, with the
aggregation a single einsum XLA fuses with the surrounding elementwise work.
The filter MLP over all N^2 pairs is where the FLOPs are — pure batched
matmul on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tsdiff_tpu.models.activations import shifted_softplus
from tsdiff_tpu.models.mlp import TorchLinear

xavier_uniform = jax.nn.initializers.glorot_uniform()


class CFConv(nn.Module):
    """Continuous-filter convolution (reference models/encoder/schnet.py:74-107).

    lin1 (no bias) and lin2 use Xavier-uniform init with zero bias, matching
    ``reset_parameters`` (reference schnet.py:85-88).
    """

    out_channels: int
    num_filters: int
    cutoff: float
    smooth: bool
    dtype: jax.typing.DTypeLike | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,          # (B, N, H)
        edge_attr: jax.Array,  # (B, N, N, H_e)
        edge_length: jax.Array,  # (B, N, N) masked distances
        emask: jax.Array,      # (B, N, N) bool
    ) -> jax.Array:
        # filter-generating network: Linear -> ssp -> Linear (schnet.py:113-117)
        w = TorchLinear(self.num_filters, dtype=self.dtype, name="mlp_0")(edge_attr)
        w = shifted_softplus(w)
        w = TorchLinear(self.num_filters, dtype=self.dtype, name="mlp_1")(w)

        if self.smooth:
            c = 0.5 * (jnp.cos(edge_length * jnp.pi / self.cutoff) + 1.0)
            c = c * (edge_length <= self.cutoff) * (edge_length >= 0.0)
        else:
            c = (edge_length <= self.cutoff)
        c = (c * emask).astype(w.dtype)
        w = w * c[..., None]

        h = nn.Dense(
            self.num_filters,
            use_bias=False,
            kernel_init=xavier_uniform,
            dtype=self.dtype,
            name="lin1",
        )(x)
        # directed edge (i -> j): message h_i * W_ij aggregated at target j
        agg = jnp.einsum("bijf,bif->bjf", w, h)
        return nn.Dense(
            self.out_channels,
            kernel_init=xavier_uniform,
            bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype,
            name="lin2",
        )(agg)


class InteractionBlock(nn.Module):
    """CFConv -> ShiftedSoftplus -> Linear (reference schnet.py:110-128)."""

    hidden_channels: int
    num_filters: int
    cutoff: float
    smooth: bool
    dtype: jax.typing.DTypeLike | None = None

    @nn.compact
    def __call__(self, x, edge_attr, edge_length, emask):
        x = CFConv(
            self.hidden_channels,
            self.num_filters,
            self.cutoff,
            self.smooth,
            dtype=self.dtype,
            name="conv",
        )(x, edge_attr, edge_length, emask)
        x = shifted_softplus(x)
        return TorchLinear(self.hidden_channels, dtype=self.dtype, name="lin")(x)


class SchNetEncoder(nn.Module):
    """Residual stack of interaction blocks (reference schnet.py:131-225).

    Production embeds nodes outside (condensenc) and passes ``z`` as float
    hidden states; the optional internal atom embedding of the reference
    (schnet.py:151-152) is intentionally omitted — node embedding lives in
    the eps-network, one source of truth.
    """

    hidden_channels: int = 128
    num_filters: int = 128
    num_interactions: int = 6
    cutoff: float = 10.0
    smooth: bool = False
    embedding: bool = False  # internal atom embedding (dualenc legacy path)
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

    @nn.compact
    def __call__(
        self,
        z: jax.Array,          # (B, N, H) node states, or (B, N) int atom types
        edge_attr: jax.Array,  # (B, N, N, H)
        edge_length: jax.Array,
        emask: jax.Array,
        node_mask: jax.Array | None = None,
    ) -> jax.Array:
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
        for i in range(self.num_interactions):
            h = h + InteractionBlock(
                self.hidden_channels,
                self.num_filters,
                self.cutoff,
                self.smooth,
                dtype=self.dtype,
                name=f"interactions_{i}",
            )(h, edge_attr, edge_length, emask)
        return h
