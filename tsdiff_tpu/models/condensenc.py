"""CondenseEncoderEpsNetwork — the production TS score network.

TPU-native re-design of reference models/epsnet/condensenc.py:47-265.

Structure (hidden H=256, feat_dim F=25 — configs/train_config.yml):

  node state   z = concat[atom_emb(Z) + feat_emb(r_feat),
                          feat_emb(p_feat) - feat_emb(r_feat)]   (B,N,H)
               (reference condensenc.py:192-198)
  edges        condensed R/P extension at ``edge_order`` + radius graph,
               rebuilt from the current coordinates every call
               (reference condensenc.py:201-206)
  edge attr    edge_cat(concat[enc(d, type_r), enc(d, type_p)])  (B,N,N,H)
               (reference condensenc.py:156-176)
  encoder      SchNet over the global edge set                    (B,N,H)
  head         re-extend at ``pred_edge_order`` (3 vs input 4,
               reference condensenc.py:219-234), then
               edge_inv = grad_dist_mlp(concat[h_i * h_j, edge_attr])
               per pair                                           (B,N,N,1)

The network is deliberately time-unconditioned: ``forward_`` never consumes
``time_step`` (reference condensenc.py:178-239); DDPM conditioning lives in
the target scaling of the loss.

All shapes are static; the whole forward is one XLA program and is rebuilt
inside each sampler scan step with zero host round-trips.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

import dataclasses
from typing import NamedTuple

from tsdiff_tpu.core.geometry import pairwise_distance
from tsdiff_tpu.core.graph_ops import (
    GraphEdges,
    StaticPairs,
    precompute_static_pairs,
    radius_edge_mask,
)
from tsdiff_tpu.core.packed import (
    PackedPairs,
    half_last_slab_mask,
    pack_static_pairs,
    packed_distance,
    packed_valid_mask,
)
from tsdiff_tpu.models.activations import activation_loader
from tsdiff_tpu.models.edge import GaussianSmearingEdgeEncoder, MLPEdgeEncoder
from tsdiff_tpu.models.mlp import MLP, TorchLinear
from tsdiff_tpu.models.schnet import SchNetEncoder

NUM_ATOM_TYPES = 100  # atomic-number embedding table size (reference condensenc.py:58)


@jax.custom_vjp
def _inference_only(x):
    """Identity with an actionable error under differentiation — guards the
    fused Pallas sampling kernel (which has no VJP) against accidental use
    inside a training objective."""
    return x


def _inference_only_fwd(x):
    return x, None


def _inference_only_bwd(res, g):
    raise NotImplementedError(
        "fused_score=True uses the inference-only Pallas score kernel, which "
        "has no gradient. Training/get_loss must run the XLA path: construct "
        "the model with fused_score=False (tsdiff_tpu.diffusion.objective."
        "diffusion_loss does this automatically)."
    )


_inference_only.defvjp(_inference_only_fwd, _inference_only_bwd)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StaticFeatures:
    """Position-INDEPENDENT features of a batch, constant across all sampling
    steps: the condensed node states and the bond-type embeddings of both
    edge orders.  Computing these once per batch (instead of at all 5000
    steps x 8 members, as the reference effectively does) removes the atom /
    bond embedding gathers and the node-state MLPs from the hot loop."""

    z: jax.Array          # (B, N, H) node states
    pairs: StaticPairs    # typed order-extension structures
    emb_r_in: jax.Array   # (B, N, N, H) bond embeddings, encoder edge order
    emb_p_in: jax.Array
    emb_r_out: jax.Array  # (B, N, N, H) at the output-head edge order
    emb_p_out: jax.Array


class PackedPairInfo(NamedTuple):
    """Member-invariant per-step quantities in offset-packed layout."""

    d_in: jax.Array    # (B, K, N) masked distances, encoder edge set
    cmask: jax.Array   # (B, K, N) float cutoff & encoder mask & 0.5-last-slab
    d_out: jax.Array   # (B, K, N) masked distances, output-head edge set
    m_eq: jax.Array    # (B, K, N) float output mask & 0.5-last-slab (for eq)


class EdgeCat(nn.Module):
    """2-layer fusion MLP for the concatenated R/P edge embeddings
    (reference condensenc.py:105-115)."""

    out_channels: int
    activation: str = "swish"
    dtype: jax.typing.DTypeLike | None = None

    @nn.compact
    def __call__(self, x):
        act = activation_loader(self.activation)
        x = TorchLinear(self.out_channels, dtype=self.dtype, name="lin0")(x)
        x = act(x)
        return TorchLinear(self.out_channels, dtype=self.dtype, name="lin1")(x)


class CondenseEncoderEpsNetwork(nn.Module):
    hidden_dim: int = 256
    feat_dim: int = 25
    edge_encoder: str = "mlp"
    mlp_act: str = "swish"
    edge_cat_act: str = "swish"
    edge_order: int = 4
    pred_edge_order: int = 3
    edge_cutoff: float = 10.0
    num_convs: int = 7
    cutoff: float = 10.0
    smooth_conv: bool = False
    use_pallas: bool = False   # fused interaction-stack kernel (inference path)
    fused_score: bool = False  # fully-fused score_step kernel (sampling path)
    packed_train: bool = False  # offset-packed XLA forward in training (2x pair FLOPs)
    score_quant: str | None = None  # "int8": quantized pair matmuls in the packed kernel
    dtype: jax.typing.DTypeLike | None = None

    @classmethod
    def from_config(cls, config, dtype=None) -> "CondenseEncoderEpsNetwork":
        """Build from a reference-compatible model config
        (reference configs/train_config.yml:1-32)."""
        enc = config.encoder
        assert enc.name == "schnet", f"unsupported encoder {enc.name} for condensenc"
        return cls(
            hidden_dim=config.hidden_dim,
            feat_dim=config.feat_dim,
            edge_encoder=config.edge_encoder,
            mlp_act=config.mlp_act,
            edge_cat_act=config.edge_cat_act,
            edge_order=config.edge_order,
            pred_edge_order=config.get("pred_edge_order", config.edge_order),
            edge_cutoff=config.edge_cutoff,
            num_convs=enc.num_convs,
            cutoff=enc.cutoff,
            smooth_conv=enc.smooth_conv,
            use_pallas=config.get("use_pallas", False),
            fused_score=config.get("fused_score", False),
            packed_train=config.get("packed_train", False),
            score_quant=config.get("score_quant", None),
            dtype=dtype,
        )

    def setup(self):
        assert self.hidden_dim % 2 == 0
        half = self.hidden_dim // 2
        self.atom_embedding = nn.Embed(
            NUM_ATOM_TYPES,
            half,
            embedding_init=jax.nn.initializers.normal(1.0),
            dtype=self.dtype,
        )
        # no-bias linear on one-hot features (reference condensenc.py:59-61)
        self.atom_feat_embedding = TorchLinear(half, use_bias=False, dtype=self.dtype)

        if self.edge_encoder == "mlp":
            self.edge_enc = MLPEdgeEncoder(
                hidden_dim=self.hidden_dim, activation=self.mlp_act, dtype=self.dtype
            )
        elif self.edge_encoder == "gaussian":
            self.edge_enc = GaussianSmearingEdgeEncoder(
                num_gaussians=self.hidden_dim // 2, cutoff=self.cutoff, dtype=self.dtype
            )
        else:
            raise NotImplementedError(f"Unknown edge encoder: {self.edge_encoder}")

        self.edge_cat = EdgeCat(
            out_channels=self.edge_enc.out_channels,
            activation=self.edge_cat_act,
            dtype=self.dtype,
        )
        self.encoder = SchNetEncoder(
            hidden_channels=self.hidden_dim,
            num_filters=self.hidden_dim,
            num_interactions=self.num_convs,
            cutoff=self.cutoff,
            smooth=self.smooth_conv,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
        )
        self.grad_dist_mlp = MLP(
            [self.hidden_dim, self.hidden_dim // 2, 1],
            activation=self.mlp_act,
            dtype=self.dtype,
        )

    def precompute_pairs(self, bond_mat, node_mask) -> StaticPairs:
        """Position-independent edge structures — compute ONCE per batch and
        pass to ``build_pair_info`` / ``__call__`` so the adjacency matmuls
        stay out of the sampling scan (see core/graph_ops.StaticPairs)."""
        return precompute_static_pairs(
            bond_mat, node_mask, self.edge_order, self.pred_edge_order
        )

    def build_pair_info(
        self, pos, node_mask, static: StaticPairs
    ) -> tuple[GraphEdges, jax.Array, GraphEdges, jax.Array]:
        """Per-step dynamic composition: union the static local sets with the
        radius mask on the current coordinates, and compute masked distances
        (reference condensenc.py:117-154 + 201-234).  The output-order
        distances reuse the input-order ones (the order-3 edge set is a
        subset of the order-4 set united with the same radius mask)."""
        mask_radius = radius_edge_mask(pos, node_mask, self.edge_cutoff)
        edges_in = GraphEdges(
            mask_global=static.mask_local_in | mask_radius,
            mask_local=static.mask_local_in,
            type_r=static.type_r_in,
            type_p=static.type_p_in,
        )
        d_in = pairwise_distance(pos, edges_in.mask_global)
        if self.pred_edge_order == self.edge_order:
            return edges_in, d_in, edges_in, d_in
        edges_out = GraphEdges(
            mask_global=static.mask_local_out | mask_radius,
            mask_local=static.mask_local_out,
            type_r=static.type_r_out,
            type_p=static.type_p_out,
        )
        d_out = jnp.where(edges_out.mask_global, d_in, 1.0)
        return edges_in, d_in, edges_out, d_out

    def _edge_embedding(self, edge_length, type_r, type_p) -> jax.Array:
        """(reference condensenc.py:156-176, emb_type='bond_w_d')."""
        attr_r = self.edge_enc(edge_length[..., None], type_r)
        attr_p = self.edge_enc(edge_length[..., None], type_p)
        return self.edge_cat(jnp.concatenate([attr_r, attr_p], axis=-1))

    def node_states(
        self,
        atom_type: jax.Array,
        r_feat: jax.Array,
        p_feat: jax.Array,
        node_mask: jax.Array,
    ) -> jax.Array:
        """Condensed node states z = [a + af_r, af_p - af_r]
        (reference condensenc.py:192-198); position-independent."""
        dt = self.dtype or jnp.float32
        a_emb = self.atom_embedding(atom_type)
        af_r = self.atom_feat_embedding(r_feat.astype(dt))
        af_p = self.atom_feat_embedding(p_feat.astype(dt))
        z = jnp.concatenate([a_emb + af_r, af_p - af_r], axis=-1)
        return z * node_mask[..., None].astype(z.dtype)

    def precompute_static(
        self,
        atom_type: jax.Array,
        r_feat: jax.Array,
        p_feat: jax.Array,
        bond_mat: jax.Array,
        node_mask: jax.Array,
    ) -> StaticFeatures:
        """All position-independent work, hoistable out of the sampling scan.

        Call as ``model.apply(params, ..., method="precompute_static")``.
        """
        z = self.node_states(atom_type, r_feat, p_feat, node_mask)
        pairs = self.precompute_pairs(bond_mat, node_mask)
        emb = self.edge_enc.bond_embedding
        return StaticFeatures(
            z=z,
            pairs=pairs,
            emb_r_in=emb(pairs.type_r_in),
            emb_p_in=emb(pairs.type_p_in),
            emb_r_out=emb(pairs.type_r_out),
            emb_p_out=emb(pairs.type_p_out),
        )

    # ---- offset-packed fast path (sampling; tsdiff_tpu/core/packed.py) ----

    def precompute_packed_pairs(self, bond_mat, node_mask) -> PackedPairs:
        """Offset-packed typed pair structures; member-invariant, once per
        batch.  Needs no parameters (bond types are embedded in-kernel)."""
        return pack_static_pairs(self.precompute_pairs(bond_mat, node_mask))

    def build_packed_pair_info(
        self, pos: jax.Array, node_mask: jax.Array, pp: PackedPairs
    ) -> PackedPairInfo:
        """Per-step member-invariant packed masks/distances — the packed
        counterpart of ``build_pair_info``.  The 0.5 factor on the k = N/2
        slab (whose rows cover each unordered pair twice) rides inside the
        float masks used for sum-aggregation."""
        n = pos.shape[1]
        valid = packed_valid_mask(node_mask)
        d_raw = packed_distance(pos, valid)
        mask_radius = valid & (d_raw <= self.edge_cutoff)
        half = half_last_slab_mask(n)[None]  # (1, K, 1)

        mask_in = pp.mask_local_in | mask_radius
        d_in = jnp.where(mask_in, d_raw, 1.0)
        cmask = ((d_in <= self.cutoff) & mask_in).astype(jnp.float32) * half

        if self.pred_edge_order == self.edge_order:
            mask_out, d_out = mask_in, d_in
        else:
            mask_out = pp.mask_local_out | mask_radius
            d_out = jnp.where(mask_out, d_raw, 1.0)
        m_eq = mask_out.astype(jnp.float32) * half
        return PackedPairInfo(d_in=d_in, cmask=cmask, d_out=d_out, m_eq=m_eq)

    def score_step_packed(
        self,
        pos: jax.Array,
        node_mask: jax.Array,
        z: jax.Array,
        pp: PackedPairs,
        pair_info: PackedPairInfo | None = None,
        interpret: bool | None = None,
    ) -> jax.Array:
        """Offset-packed fused score step: returns packed edge_inv (B, K, N)
        float32 — HALF the pair-MLP FLOPs of ``score_step``.  Chain-rule with
        core.packed.eq_transform_packed(out, pos, pair_info.m_eq,
        pair_info.d_out).  Call via ``model.apply(params, ...,
        method="score_step_packed")``."""
        assert self.edge_encoder == "mlp", "packed score requires the MLP edge encoder"
        assert not self.smooth_conv, "packed score requires the hard cutoff"
        assert self.mlp_act == "swish" and self.edge_cat_act == "swish"
        if self.score_quant == "int8":
            from tsdiff_tpu.ops.pallas.condensed_score_packed_int8 import (
                extract_weights_packed_int8 as extract_weights_packed,
                packed_score_pallas_int8 as packed_score_pallas,
            )
        else:
            assert self.score_quant is None, f"unknown score_quant {self.score_quant}"
            from tsdiff_tpu.ops.pallas.condensed_score_packed import (
                extract_weights_packed,
                packed_score_pallas,
            )

        if pair_info is None:
            pair_info = self.build_packed_pair_info(pos, node_mask, pp)
        if interpret is None:
            # the Mosaic kernel needs a TPU; everywhere else (CPU tests, CLI
            # smoke runs) the interpreter executes the same program
            interpret = jax.default_backend() != "tpu"
        return packed_score_pallas(
            extract_weights_packed(self.variables),
            z,
            pair_info.d_in,
            pair_info.cmask,
            pp.type_r_in,
            pp.type_p_in,
            pp.type_r_out,
            pp.type_p_out,
            num_blocks=self.num_convs,
            dtype=self.dtype or jnp.float32,
            interpret=interpret,
        )

    def score_step_packed_xla(
        self,
        pos: jax.Array,
        node_mask: jax.Array,
        z: jax.Array,
        pp: PackedPairs,
        pair_info: PackedPairInfo | None = None,
    ) -> tuple[jax.Array, PackedPairInfo]:
        """Differentiable packed score (ops/packed_score_xla.py): same 2x
        pair-FLOP cut as the Pallas kernel, in plain XLA — used by the packed
        TRAINING objective and as the kernel's same-layout oracle."""
        assert self.edge_encoder == "mlp" and not self.smooth_conv
        assert self.mlp_act == "swish" and self.edge_cat_act == "swish"
        from tsdiff_tpu.ops.packed_score_xla import packed_score_xla
        from tsdiff_tpu.ops.pallas.condensed_score_packed import (
            extract_weights_packed,
        )

        if pair_info is None:
            pair_info = self.build_packed_pair_info(pos, node_mask, pp)
        score = packed_score_xla(
            extract_weights_packed(self.variables),
            z,
            pair_info.d_in,
            pair_info.cmask,
            pp.type_r_in,
            pp.type_p_in,
            pp.type_r_out,
            pp.type_p_out,
            num_blocks=self.num_convs,
            dtype=self.dtype or jnp.float32,
        )
        return score, pair_info

    def score_step(
        self,
        pos: jax.Array,
        node_mask: jax.Array,
        static: StaticFeatures,
        pair_info=None,
    ) -> tuple[jax.Array, GraphEdges, jax.Array]:
        """Position-dependent part of the forward — the per-sampling-step work.

        Numerically identical to ``__call__`` given the same inputs: the
        distance MLP is evaluated once on the encoder-order distances and
        shared with the output stage (the order-3 global edge set is a subset
        of the order-4 one, so all surviving pairs carry identical distances;
        non-surviving pairs are masked downstream by CFConv's edge mask and
        eq_transform's score mask).

        ``pair_info`` (a ``build_pair_info`` result) is member-invariant —
        ensemble callers compute it once outside the member vmap.
        """
        dt = self.dtype or jnp.float32
        if pair_info is None:
            pair_info = self.build_pair_info(pos, node_mask, static.pairs)
        edges_in, d_in, edges_out, d_out = pair_info

        if self.fused_score and not self.is_initializing():
            # fully-fused Pallas path (sampling): everything after the
            # distance/mask computation runs in one kernel.  During init the
            # XLA path below runs instead so every submodule declares its
            # parameters (the kernel consumes them as raw arrays).
            assert self.edge_encoder == "mlp", "fused_score requires the MLP edge encoder"
            assert not self.smooth_conv, "fused_score requires the hard cutoff"
            assert self.mlp_act == "swish" and self.edge_cat_act == "swish"
            from tsdiff_tpu.ops.pallas.condensed_score import (
                condensed_score_pallas,
                extract_weights,
            )

            cmask = (
                (d_in <= self.cutoff) & edges_in.mask_global
            ).astype(jnp.float32)
            edge_inv = condensed_score_pallas(
                extract_weights(self.variables),
                static.z,
                d_in,
                cmask,
                static.emb_r_in,
                static.emb_p_in,
                static.emb_r_out,
                static.emb_p_out,
                num_blocks=self.num_convs,
                dtype=dt,
            )
            return _inference_only(edge_inv), edges_out, d_out

        d_emb = self.edge_enc.d_embedding(d_in.astype(dt)[..., None])
        combine = self.edge_enc.combine
        edge_attr = self.edge_cat(
            jnp.concatenate(
                [combine(d_emb, static.emb_r_in), combine(d_emb, static.emb_p_in)],
                axis=-1,
            )
        )
        node_attr = self.encoder(static.z, edge_attr, d_in, edges_in.mask_global)

        if self.pred_edge_order != self.edge_order:
            edge_attr = self.edge_cat(
                jnp.concatenate(
                    [combine(d_emb, static.emb_r_out), combine(d_emb, static.emb_p_out)],
                    axis=-1,
                )
            )

        h_pair = jnp.concatenate(
            [node_attr[:, :, None, :] * node_attr[:, None, :, :], edge_attr], axis=-1
        )
        edge_inv = self.grad_dist_mlp(h_pair)
        return edge_inv.astype(jnp.float32), edges_out, d_out

    def __call__(
        self,
        atom_type: jax.Array,   # (B, N) int
        r_feat: jax.Array,      # (B, N, F)
        p_feat: jax.Array,      # (B, N, F)
        pos: jax.Array,         # (B, N, 3)
        bond_mat: jax.Array,    # (B, N, N) int condensed types
        node_mask: jax.Array,   # (B, N) bool
        pair_info=None,         # optional precomputed build_pair_info output
    ) -> tuple[jax.Array, GraphEdges, jax.Array]:
        """Score-network forward (reference condensenc.py:178-239 ``forward_``).

        Returns (edge_inv (B,N,N,1) float32, edges at pred_edge_order,
        edge_length float32).  Composition of ``precompute_static`` (position-
        independent) and ``score_step`` (per-coordinate) — samplers call the
        two parts separately to hoist the static work out of the scan.
        ``pair_info`` is accepted for API compatibility and ignored (the
        static path recomputes the same structures).
        """
        del pair_info
        static = self.precompute_static(atom_type, r_feat, p_feat, bond_mat, node_mask)
        return self.score_step(pos, node_mask, static)
