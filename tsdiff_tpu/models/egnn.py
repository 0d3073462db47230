"""EGNN mixed 2D/3D encoder on the dense pair grid (optional encoder).

Re-design of reference models/encoder/egnn.py: per round, an equivariant
EGNN layer over the global (radius) edge set updates (pos, h) — mean-
aggregated edge messages plus a coordinate update along pair differences —
interleaved with a GINE conv over the local R/P edges whose messages are
gated by fused R/P edge attributes; the two node streams are fused by a
2-layer MLP and added residually (reference egnn.py:95-110).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tsdiff_tpu.models.activations import activation_loader
from tsdiff_tpu.models.mlp import TorchLinear


def masked_mean(msgs: jax.Array, emask: jax.Array, axis: int) -> jax.Array:
    """Mean over real incoming edges (dense scatter_mean equivalent)."""
    m = emask[..., None].astype(msgs.dtype)
    s = jnp.sum(msgs * m, axis=axis)
    cnt = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return s / cnt


class _MLP2(nn.Module):
    """Linear -> swish -> Linear (the edge_cat / fin_layer shape)."""

    mid: int
    out: int
    act: str = "swish"
    dtype: jax.typing.DTypeLike | None = None

    @nn.compact
    def __call__(self, x):
        a = activation_loader(self.act)
        x = TorchLinear(self.mid, dtype=self.dtype, name="lin0")(x)
        return TorchLinear(self.out, dtype=self.dtype, name="lin1")(a(x))


class EGNNSparseLayer(nn.Module):
    """Equivariant layer (reference egnn.py:178-296), dense formulation.

    For each directed pair (s -> t) of the global edge set, with
    dist = |pos_s - pos_t|^2:
      m1 = LN(mlp1([x_t, x_s, dist]));  m2 = (pos_t - pos_s) * LN(mlp2(...))
    mean-aggregated at t; node update x += LN(node_mlp([LN(x), m1_t]));
    pos += m2_t.
    """

    hidden_dim: int
    dropout: float = 0.1
    dtype: jax.typing.DTypeLike | None = None

    @nn.compact
    def __call__(self, pos, x, emask, deterministic: bool = True):
        H = self.hidden_dim
        m_dim = H // 2
        diff = pos[:, :, None, :] - pos[:, None, :, :]      # diff[t,s] = pos_t - pos_s
        dist = jnp.sum(diff * diff, axis=-1, keepdims=True)  # squared distance

        x_t = x[:, :, None, :].repeat(x.shape[1], axis=2)   # (B, T, S, H) target
        x_s = x[:, None, :, :].repeat(x.shape[1], axis=1)   # source
        feat = jnp.concatenate([x_t, x_s, dist.astype(x.dtype)], axis=-1)

        drop = nn.Dropout(self.dropout, deterministic=deterministic)

        def mlp(out_dim, name):
            def f(v):
                v = TorchLinear(2 * H, dtype=self.dtype, name=f"{name}_lin0")(v)
                v = drop(v)
                v = jax.nn.silu(v)
                v = TorchLinear(out_dim, dtype=self.dtype, name=f"{name}_lin1")(v)
                return jax.nn.silu(v)

            return f

        m1 = mlp(m_dim, "edge_mlp1")(feat)
        m1 = nn.LayerNorm(dtype=self.dtype, name="edge_norm1")(m1)
        m2 = mlp(1, "edge_mlp2")(feat)
        m2 = nn.LayerNorm(dtype=self.dtype, name="edge_norm2")(m2)
        m2 = diff * m2.astype(diff.dtype)

        # mean over sources (axis 2 = s) at each target t
        m1_t = masked_mean(m1, emask, axis=2)
        m2_t = masked_mean(m2, emask, axis=2)

        xn = nn.LayerNorm(dtype=self.dtype, name="node_norm1")(x)
        upd = jnp.concatenate([xn, m1_t], axis=-1)
        upd = TorchLinear(2 * H, dtype=self.dtype, name="node_mlp_lin0")(upd)
        upd = drop(upd)
        upd = jax.nn.silu(upd)
        upd = TorchLinear(H, dtype=self.dtype, name="node_mlp_lin1")(upd)
        upd = nn.LayerNorm(dtype=self.dtype, name="node_norm2")(upd)
        return pos + m2_t, x + upd


class GINEConvGated(nn.Module):
    """GINE variant whose messages are x_s * edge_cat([attr_r, attr_p])
    (reference egnn.py:113-159)."""

    hidden_dim: int
    dtype: jax.typing.DTypeLike | None = None

    @nn.compact
    def __call__(self, x, attr_r, attr_p, emask):
        H = self.hidden_dim
        gate = _MLP2(2 * H, H, dtype=self.dtype, name="edge_cat")(
            jnp.concatenate([attr_r, attr_p], axis=-1)
        )
        # message for (s -> t): silu(x_s * gate[s, t]), add-aggregated at t
        msg = jax.nn.silu(x[:, :, None, :] * gate)  # index (s, t)
        msg = msg * emask[..., None].astype(msg.dtype)
        agg = jnp.sum(msg, axis=1)  # sum over sources s
        out = agg + x  # (1 + eps) x with eps = 0
        return _MLP2(2 * H, H, dtype=self.dtype, name="fin_layer")(out)


class EGNNMixed2DEncoder(nn.Module):
    """Interleaved EGNN(3D, global edges) + GINE(2D, local R/P edges) stack
    (reference egnn.py:10-110)."""

    hidden_dim: int = 128
    num_convs: int = 5
    dropout: float = 0.1
    dtype: jax.typing.DTypeLike | None = None

    @classmethod
    def from_config(cls, config, dtype=None) -> "EGNNMixed2DEncoder":
        return cls(
            hidden_dim=config.hidden_dim,
            num_convs=config.num_convs,
            dropout=config.get("dropout", 0.1),
            dtype=dtype,
        )

    @nn.compact
    def __call__(
        self,
        node,         # (B, N, H)
        mask_local,   # (B, N, N)
        attr_r,       # (B, N, N, H) R-side local edge attributes
        attr_p,       # (B, N, N, H)
        mask_global,  # (B, N, N)
        pos,          # (B, N, 3)
        deterministic: bool = True,
    ):
        # ONE shared fusion MLP across all rounds (reference egnn.py:67-71)
        lincat = _MLP2(
            2 * self.hidden_dim, self.hidden_dim, dtype=self.dtype, name="lincat"
        )
        h = node
        for i in range(self.num_convs):
            pos, h1 = EGNNSparseLayer(
                self.hidden_dim, self.dropout, dtype=self.dtype, name=f"egnn_{i}"
            )(pos, h, mask_global, deterministic)
            h2 = GINEConvGated(self.hidden_dim, dtype=self.dtype, name=f"gin_{i}")(
                h, attr_r, attr_p, mask_local
            )
            h = h + lincat(jnp.concatenate([h1, h2], axis=-1))
        return h
