"""GIN encoder on the dense pair grid (dualenc local branch).

Re-design of reference models/encoder/gin.py: GINEConv message passing
``out = nn((1 + eps) * x_i + sum_j act(x_j + edge_attr_ji))`` with add
aggregation over the (masked, dense) local edge set, stacked with residual
short-cuts.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tsdiff_tpu.models.activations import activation_loader
from tsdiff_tpu.models.mlp import MLP


class GINEConv(nn.Module):
    """(reference gin.py:19-76); eps fixed at 0 (train_eps False in all uses)."""

    hidden_dim: int
    activation: str = "relu"
    eps: float = 0.0
    dtype: jax.typing.DTypeLike | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,          # (B, N, H)
        edge_attr: jax.Array,  # (B, N, N, H)
        emask: jax.Array,      # (B, N, N)
    ) -> jax.Array:
        act = activation_loader(self.activation)
        # message for directed edge (i -> j): act(x_i + edge_attr_ij), agg at j
        msg = act(x[:, :, None, :] + edge_attr)
        msg = msg * emask[..., None].astype(msg.dtype)
        agg = jnp.sum(msg, axis=1)  # (B, N, H)
        out = agg + (1.0 + self.eps) * x
        return MLP(
            [self.hidden_dim, self.hidden_dim],
            activation=self.activation,
            dtype=self.dtype,
            name="nn",
        )(out)


class GINEncoder(nn.Module):
    """Residual GIN stack (reference gin.py:79-149)."""

    hidden_dim: int
    num_convs: int = 3
    activation: str = "relu"
    short_cut: bool = True
    concat_hidden: bool = False
    embedding: bool = False
    dtype: jax.typing.DTypeLike | None = None

    @nn.compact
    def __call__(self, z, edge_attr, emask, node_mask=None):
        act = activation_loader(self.activation)
        if self.embedding:
            h = nn.Embed(
                100,
                self.hidden_dim,
                embedding_init=jax.nn.initializers.normal(1.0),
                dtype=self.dtype,
                name="node_emb",
            )(z)
        else:
            h = z
        if node_mask is not None:
            h = h * node_mask[..., None].astype(h.dtype)

        hiddens = []
        for i in range(self.num_convs):
            hidden = GINEConv(
                self.hidden_dim, self.activation, dtype=self.dtype, name=f"convs_{i}"
            )(h, edge_attr, emask)
            if i < self.num_convs - 1:
                hidden = act(hidden)
            if self.short_cut:
                hidden = hidden + h
            hiddens.append(hidden)
            h = hidden
        if self.concat_hidden:
            return jnp.concatenate(hiddens, axis=-1)
        return hiddens[-1]
