"""ComENet encoder on the dense pair grid (optional encoder).

Re-design of reference models/encoder/comenet.py: complete-and-efficient
message passing with per-node nearest/second-nearest reference frames and
rotation-invariant (d, theta, phi, tau) edge coordinates fed through joint
Bessel x spherical-harmonic bases (TorsionEmb / AngleEmb,
tsdiff_tpu/ops/basis.py), fused with R/P bond-type embeddings through a
shared edge_cat (reference comenet.py:599-614).

The reference's scatter_min-based frame selection (comenet.py:370-454)
becomes a masked dense argmin over each node's incident-edge distances; the
edge list (j -> i) maps to dense entries [i, j] ([target, source]).

NOTE: the reference's ``SimpleInteractionBlock.forward`` takes 6 arguments
but is called with 5 (reference comenet.py:277-302 vs 618-625) — a latent
TypeError; and the separate ``edge_bond_attr`` input of EdgeGraphConv is
never supplied.  This implementation uses the working interpretation: each
conv consumes its fused (geometry x bond) edge attribute, with the attention
gate of comenet.py:212-220 intact.  The experimental pi-interaction features
(comenet.py:305-367) are host-side research utilities and are not carried
over.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from tsdiff_tpu.ops.basis import AngleEmb, TorsionEmb

glorot = jax.nn.initializers.glorot_uniform()


def _glin(features, use_bias=True, kernel_init=glorot, name=None):
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=kernel_init,
        bias_init=jax.nn.initializers.zeros,
        name=name,
    )


class TwoLayerLinear(nn.Module):
    """(reference comenet.py:96-129)."""

    middle: int
    out: int
    dropout: float = 0.1
    act: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        x = drop(_glin(self.middle, name="lin1")(x))
        if self.act:
            x = jax.nn.silu(x)
        x = drop(_glin(self.out, name="lin2")(x))
        if self.act:
            x = jax.nn.silu(x)
        return x


def dense_frames(dist: jax.Array, emask: jax.Array, cutoff: float):
    """Per-node nearest (n0) / second-nearest (n1) incident-edge partners.

    Dense equivalent of the scatter_min logic (reference comenet.py:370-395):
    returns integer partner indices (B, N) and their validity; nodes with no
    incident edges get index 0 (garbage masked downstream, as in the
    reference's ``argmin >= len`` clamping).
    """
    big = jnp.asarray(1e30, dist.dtype)
    d0 = jnp.where(emask, dist, big)
    n0 = jnp.argmin(d0, axis=-1)  # (B, N) per target
    # mask out the nearest to find the second-nearest (reference adds cutoff)
    onehot0 = jax.nn.one_hot(n0, dist.shape[-1], dtype=dist.dtype)
    d1 = d0 + onehot0 * big
    n1 = jnp.argmin(d1, axis=-1)
    return n0, n1


def comenet_features(pos: jax.Array, emask: jax.Array, cutoff: float):
    """(theta, phi, tau) per dense edge [i, j] = (j -> i)
    (reference comenet.py:370-454, folded-to-[0, pi) convention kept)."""
    V = pos[:, None, :, :] - pos[:, :, None, :]  # V[t, s] = pos_s - pos_t
    dist = jnp.sqrt(jnp.maximum(jnp.sum(V * V, axis=-1), 1e-18))
    n0, n1 = dense_frames(dist, emask, cutoff)

    def gather_vec(n):  # v[t] = V[t, n[t]]
        return jnp.take_along_axis(V, n[:, :, None, None].repeat(3, -1), axis=2)[
            :, :, 0
        ]

    v0 = gather_vec(n0)  # (B, N, 3) nearest-edge vector per node
    v1 = gather_vec(n1)

    B, N = dist.shape[:2]
    pos_ji = V  # per edge [t, s]
    pos_in0 = v0[:, :, None, :]  # target t's nearest vec, broadcast over s
    pos_in1 = v1[:, :, None, :]

    def fold(x):
        return jnp.where(x < 0, x + math.pi, x)

    a = jnp.sum(-pos_ji * pos_in0, axis=-1)
    b = jnp.linalg.norm(jnp.cross(-pos_ji, jnp.broadcast_to(pos_in0, pos_ji.shape)), axis=-1)
    theta = fold(jnp.arctan2(b, a))

    dist_safe = jnp.maximum(dist, 1e-9)
    plane1 = jnp.cross(-pos_ji, jnp.broadcast_to(pos_in0, pos_ji.shape))
    plane2 = jnp.cross(-pos_ji, jnp.broadcast_to(pos_in1, pos_ji.shape))
    a = jnp.sum(plane1 * plane2, axis=-1)
    b = jnp.sum(jnp.cross(plane1, plane2) * pos_ji, axis=-1) / dist_safe
    phi = fold(jnp.arctan2(b, a))

    # reference-atom selection for tau: skip the partner itself
    # (reference comenet.py:412-422)
    src_idx = jnp.arange(N)[None, None, :]
    iref = jnp.where((n0[:, :, None] == src_idx), 1, 0)  # n0(t) == s ?
    pos_iref = jnp.where(iref[..., None] == 1, pos_in1, pos_in0)
    # j-side reference: node s's nearest vec (or second if it points at t).
    # NOTE orientation: the reference's j-side vec is source-minus-target,
    # i.e. node_s - partner = -(partner - node_s) (reference comenet.py:
    # 384-395 scatter over j with vecs = pos[j] - pos[i]).
    tgt_idx = jnp.arange(N)[None, :, None]
    jref_is_t = n0[:, None, :] == tgt_idx  # n0(s) == t ?
    v0_s = v0[:, None, :, :].repeat(N, axis=1)
    v1_s = v1[:, None, :, :].repeat(N, axis=1)
    pos_jref = -jnp.where(jref_is_t[..., None], v1_s, v0_s)

    plane1 = jnp.cross(pos_ji, pos_jref)
    plane2 = jnp.cross(pos_ji, jnp.broadcast_to(pos_iref, pos_ji.shape))
    a = jnp.sum(plane1 * plane2, axis=-1)
    b = jnp.sum(jnp.cross(plane1, plane2) * pos_ji, axis=-1) / dist_safe
    tau = fold(jnp.arctan2(b, a))

    return dist, theta, phi, tau


class EdgeGraphConv(nn.Module):
    """Attention-gated edge conv (reference comenet.py:148-223)."""

    hidden: int

    @nn.compact
    def __call__(self, x, edge_attr, emask):
        ew = _glin(self.hidden, name="edge_lin_1")(edge_attr)
        ew = _glin(self.hidden, name="edge_lin_2")(jax.nn.silu(ew))
        # message for (s -> t): x_s * ew[t,s], gated by sigmoid attention
        msg = x[:, None, :, :] * ew  # (B, t, s, H)
        attn = jax.nn.sigmoid(_glin(1, name="edge_attn_1")(msg))
        msg = msg * attn * emask[..., None].astype(msg.dtype)
        agg = jnp.sum(msg, axis=2)
        return _glin(self.hidden, name="lin_rel")(agg) + _glin(
            self.hidden, use_bias=False, name="lin_root"
        )(x)


class GraphNorm(nn.Module):
    """Masked per-graph GraphNorm (learnable alpha/gamma/beta)."""

    hidden: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, node_mask):
        alpha = self.param("alpha", jax.nn.initializers.ones, (self.hidden,))
        gamma = self.param("gamma", jax.nn.initializers.ones, (self.hidden,))
        beta = self.param("beta", jax.nn.initializers.zeros, (self.hidden,))
        m = node_mask[..., None].astype(x.dtype)
        cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x * m, axis=1, keepdims=True) / cnt
        shifted = (x - alpha * mean) * m
        var = jnp.sum(shifted**2 * m, axis=1, keepdims=True) / cnt
        return gamma * shifted / jnp.sqrt(var + self.eps) + beta


class SimpleInteractionBlock(nn.Module):
    """(reference comenet.py:226-302, working-call interpretation)."""

    hidden: int
    num_layers: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, attr1, attr2, emask, node_mask, deterministic=True):
        act = jax.nn.silu
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        x = act(_glin(self.hidden, name="lin")(x))
        h1 = act(_glin(self.hidden, name="lin1")(
            EdgeGraphConv(self.hidden, name="conv1")(x, attr1, emask)
        ))
        h2 = act(_glin(self.hidden, name="lin2")(
            EdgeGraphConv(self.hidden, name="conv2")(x, attr2, emask)
        ))
        h = _glin(self.hidden, name="lin_cat")(jnp.concatenate([h1, h2], -1))
        h = h + x
        for i in range(self.num_layers):
            h = act(drop(_glin(self.hidden, name=f"lins_{i}")(h))) + h
        h = GraphNorm(self.hidden, name="norm")(h, node_mask)
        return _glin(self.hidden, name="final")(h)


class ComENetEncoder(nn.Module):
    """(reference comenet.py:457-633)."""

    cutoff: float = 8.0
    num_layers: int = 4
    hidden_channels: int = 256
    out_channels: int = 256
    num_radial: int = 3
    num_spherical: int = 2
    num_output_layers: int = 3
    dropout: float = 0.1

    @classmethod
    def from_config(cls, config, dtype=None) -> "ComENetEncoder":
        return cls(
            cutoff=config.cutoff,
            num_layers=config.num_convs,
            hidden_channels=config.hidden_dim,
            out_channels=config.hidden_dim,
            num_radial=config.num_radial,
            num_spherical=config.num_spherical,
            dropout=config.get("dropout", 0.1),
        )

    @nn.compact
    def __call__(
        self,
        z: jax.Array,          # (B, N, H) node states
        pos: jax.Array,        # (B, N, 3)
        emask: jax.Array,      # (B, N, N)
        type_r: jax.Array,     # (B, N, N) int R-side edge types
        type_p: jax.Array,     # (B, N, N) int P-side edge types
        node_mask: jax.Array,
        deterministic: bool = True,
    ):
        H = self.hidden_channels
        act = jax.nn.silu
        x = z

        dist, theta, phi, tau = comenet_features(pos, emask, self.cutoff)
        dist = jnp.where(emask, dist, self.cutoff * 2.0)

        feature1 = TorsionEmb(self.num_radial, self.num_spherical, self.cutoff)
        feature2 = AngleEmb(self.num_radial, self.num_spherical, self.cutoff)

        edge_emb = nn.Embed(
            100,
            H,
            embedding_init=lambda k, s, d=jnp.float32: jax.random.uniform(
                k, s, d, -math.sqrt(3), math.sqrt(3)
            ),
            name="edge_emb",
        )
        emb_r = edge_emb(type_r)
        emb_p = edge_emb(type_p)

        class EdgeCat(nn.Module):
            @nn.compact
            def __call__(slf, v):
                v = _glin(H, name="lin0")(v)
                return _glin(H, name="lin1")(act(v))

        edge_cat = EdgeCat(name="edge_cat")

        g1 = TwoLayerLinear(
            H, H, self.dropout, name="lin_feature1"
        )(feature1(dist, theta, phi), deterministic)
        attr1 = edge_cat(jnp.concatenate([g1 * emb_r, g1 * emb_p], -1))
        g2 = TwoLayerLinear(
            H, H, self.dropout, name="lin_feature2"
        )(feature2(dist, tau), deterministic)
        attr2 = edge_cat(jnp.concatenate([g2 * emb_r, g2 * emb_p], -1))

        residual = x
        for i in range(self.num_layers):
            _x = SimpleInteractionBlock(
                H, self.num_output_layers, self.dropout, name=f"interaction_{i}"
            )(x, attr1, attr2, emask, node_mask, deterministic)
            x = _x + residual
            residual = residual + _x

        for i in range(self.num_output_layers):
            x = act(_glin(H, name=f"lins_{i}")(x))
        x = _glin(
            self.out_channels,
            kernel_init=jax.nn.initializers.zeros,
            name="lin_out",
        )(x)
        return x * node_mask[..., None].astype(x.dtype)
