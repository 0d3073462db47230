"""DualEncoderEpsNetwork — GeoDiff-legacy dual global/local score network.

TPU-native re-design of reference models/epsnet/dualenc.py:62-374 on the
dense pair grid:

  * global branch: SchNet (internal atom embedding) over the order-extended +
    radius edge set, with its own edge encoder and grad-dist head;
  * local branch: GIN over the 2D (bonded/extended) edges only, likewise;
  * edge types use the GeoDiff-legacy encoding from
    ``extend_graph_order_radius``: bond codes as-is, k-hop codes offset past
    ``NUM_BOND_TYPES**2`` (reference models/common.py:303-305), decomposed at
    forward time into per-side R/P types in TS mode
    (reference dualenc.py:270-293);
  * ``diffusion`` (DDPM, implicit noise conditioning) and ``dsm`` (annealed
    score matching: geometric sigma ladder, per-edge 1/sigma output scaling,
    reference dualenc.py:142-156, 247-267, 311-313) model types.

Losses and legacy samplers live in tsdiff_tpu/diffusion/dual_objective.py and
tsdiff_tpu/diffusion/sampler.py (the update rules are shared).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tsdiff_tpu.chem import NUM_BOND_TYPES
from tsdiff_tpu.core.geometry import pairwise_distance
from tsdiff_tpu.core.graph_ops import extend_graph_order, pair_mask, radius_edge_mask
from tsdiff_tpu.models.condensenc import EdgeCat
from tsdiff_tpu.models.edge import GaussianSmearingEdgeEncoder, MLPEdgeEncoder
from tsdiff_tpu.models.gin import GINEncoder
from tsdiff_tpu.models.mlp import MLP
from tsdiff_tpu.models.schnet import SchNetEncoder


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DualEdges:
    """Dense legacy edge sets: global = order-extended ∪ radius (typed),
    local = typed subset (edge_type > 0, reference dualenc.py:1222-1223)."""

    mask_global: jax.Array  # (B, N, N) bool
    mask_local: jax.Array   # (B, N, N) bool
    edge_type: jax.Array    # (B, N, N) int32 legacy codes


def decompose_legacy_types(edge_type: jax.Array, ts_mode: bool):
    """Per-side type decomposition (reference dualenc.py:270-293).

    Bond codes (< nb^2) hold ``r*nb + p`` in TS mode; k-hop codes are
    ``nb^2 + k - 1`` and map to ``nb + k - 1`` for embedding.
    """
    nb = NUM_BOND_TYPES
    is_bondish = edge_type // nb**2 == 0
    high = jnp.where(~is_bondish, edge_type % nb**2 + nb, 0)
    if ts_mode:
        t1 = jnp.where(is_bondish, edge_type // nb, 0) + high
        t2 = jnp.where(is_bondish, edge_type % nb, 0) + high
        return t1, t2
    t1 = jnp.where(is_bondish, edge_type % nb, 0) + high
    return t1, None


class DualEncoderEpsNetwork(nn.Module):
    hidden_dim: int = 128
    num_convs: int = 6
    num_convs_local: int = 4
    cutoff: float = 10.0
    mlp_act: str = "relu"
    edge_order: int = 3
    edge_encoder: str = "mlp"
    smooth_conv: bool = False
    model_type: str = "diffusion"  # diffusion | dsm
    ts_mode: bool = False
    edge_cat_act: str = "relu"
    # dsm sigma ladder (reference dualenc.py:142-156)
    sigma_begin: float = 10.0
    sigma_end: float = 0.01
    num_noise_level: int = 50
    dtype: jax.typing.DTypeLike | None = None

    @classmethod
    def from_config(cls, config, dtype=None) -> "DualEncoderEpsNetwork":
        return cls(
            hidden_dim=config.hidden_dim,
            num_convs=config.num_convs,
            num_convs_local=config.num_convs_local,
            cutoff=config.cutoff,
            mlp_act=config.mlp_act,
            edge_order=config.edge_order,
            edge_encoder=config.edge_encoder,
            smooth_conv=config.smooth_conv,
            model_type=config.type,
            ts_mode=bool(config.get("TS", False)),
            edge_cat_act=config.get("edge_cat_act", "relu"),
            sigma_begin=config.get("sigma_begin", 10.0),
            sigma_end=config.get("sigma_end", 0.01),
            num_noise_level=config.get("num_noise_level", 50),
            dtype=dtype,
        )

    @property
    def sigmas(self) -> np.ndarray:
        """Geometric sigma ladder for dsm (reference dualenc.py:144-153)."""
        return np.exp(
            np.linspace(
                np.log(self.sigma_begin), np.log(self.sigma_end), self.num_noise_level
            )
        ).astype(np.float32)

    def setup(self):
        mk_enc = (
            (lambda: MLPEdgeEncoder(self.hidden_dim, self.mlp_act, dtype=self.dtype))
            if self.edge_encoder == "mlp"
            else (lambda: GaussianSmearingEdgeEncoder(self.hidden_dim // 2, self.cutoff, dtype=self.dtype))
        )
        self.edge_encoder_global = mk_enc()
        self.edge_encoder_local = mk_enc()
        self.encoder_global = SchNetEncoder(
            hidden_channels=self.hidden_dim,
            num_filters=self.hidden_dim,
            num_interactions=self.num_convs,
            cutoff=self.cutoff,
            smooth=self.smooth_conv,
            embedding=True,
            dtype=self.dtype,
        )
        self.encoder_local = GINEncoder(
            hidden_dim=self.hidden_dim,
            num_convs=self.num_convs_local,
            embedding=True,
            dtype=self.dtype,
        )
        self.grad_global_dist_mlp = MLP(
            [self.hidden_dim, self.hidden_dim // 2, 1],
            activation=self.mlp_act,
            dtype=self.dtype,
        )
        self.grad_local_dist_mlp = MLP(
            [self.hidden_dim, self.hidden_dim // 2, 1],
            activation=self.mlp_act,
            dtype=self.dtype,
        )
        if self.ts_mode:
            out_ch = self.edge_encoder_global.out_channels
            self.edge_cat_global = EdgeCat(out_ch, self.edge_cat_act, dtype=self.dtype)
            self.edge_cat_local = EdgeCat(out_ch, self.edge_cat_act, dtype=self.dtype)

    def build_edges(self, bond_mat, pos, node_mask, extend_order=True, extend_radius=True, is_sidechain=None) -> DualEdges:
        """Legacy edge construction on current coordinates
        (reference models/common.py:387-417).

        With ``is_sidechain`` (B, N) bool, radius edges are restricted to
        pairs touching at least one sidechain atom (reference
        models/common.py:343-368: radius neighbors are computed around
        sidechain atoms only, then symmetrized)."""
        mask_typed, types = extend_graph_order(
            bond_mat, node_mask, self.edge_order
        ) if extend_order else (
            (jnp.where(pair_mask(node_mask), bond_mat, 0) > 0),
            jnp.where(pair_mask(node_mask), bond_mat, 0).astype(jnp.int32),
        )
        if extend_radius:
            rmask = radius_edge_mask(pos, node_mask, self.cutoff)
            if is_sidechain is not None:
                sc = is_sidechain & node_mask
                rmask = rmask & (sc[:, :, None] | sc[:, None, :])
            mask_global = mask_typed | rmask
        else:
            mask_global = mask_typed
        types = jnp.where(mask_global, types, 0)
        return DualEdges(
            mask_global=mask_global, mask_local=types > 0, edge_type=types
        )

    def _edge_attr(self, enc, cat, d, edge_type):
        t1, t2 = decompose_legacy_types(edge_type, self.ts_mode)
        dt = self.dtype or jnp.float32
        d_in = d.astype(dt)[..., None]
        if self.ts_mode:
            a1 = enc(d_in, t1)
            a2 = enc(d_in, t2)
            return cat(jnp.concatenate([a1, a2], axis=-1))
        return enc(d_in, t1)

    def __call__(
        self,
        atom_type: jax.Array,  # (B, N) int
        pos: jax.Array,        # (B, N, 3)
        bond_mat: jax.Array,   # (B, N, N) int legacy-condensed types
        node_mask: jax.Array,  # (B, N)
        time_step: jax.Array | None = None,  # (B,) int, dsm only
        extend_order: bool = True,
        extend_radius: bool = True,
        is_sidechain: jax.Array | None = None,  # (B, N) bool, protein mode
    ):
        """Forward (reference dualenc.py:206-374).

        Returns (edge_inv_global, edge_inv_local, edges, edge_length), with
        edge_inv_local defined on the dense grid but meaningful only on
        ``edges.mask_local``.
        """
        edges = self.build_edges(
            bond_mat, pos, node_mask, extend_order, extend_radius, is_sidechain
        )
        d = pairwise_distance(pos, edges.mask_global)

        if self.model_type == "dsm":
            assert time_step is not None, "dsm forward needs time_step"
            sigmas = jnp.asarray(self.sigmas)
            sigma_edge = sigmas[time_step][:, None, None, None]  # (B,1,1,1)
            inv_sigma = 1.0 / sigma_edge
        else:
            inv_sigma = 1.0

        # Global branch
        attr_g = self._edge_attr(
            self.edge_encoder_global,
            getattr(self, "edge_cat_global", None),
            d,
            edges.edge_type,
        )
        node_g = self.encoder_global(atom_type, attr_g, d, edges.mask_global, node_mask)
        h_pair_g = jnp.concatenate(
            [node_g[:, :, None, :] * node_g[:, None, :, :], attr_g], axis=-1
        )
        edge_inv_global = self.grad_global_dist_mlp(h_pair_g).astype(jnp.float32) * inv_sigma

        # Local branch (messages restricted to the typed local edge set)
        attr_l = self._edge_attr(
            self.edge_encoder_local,
            getattr(self, "edge_cat_local", None),
            d,
            edges.edge_type,
        )
        node_l = self.encoder_local(atom_type, attr_l, edges.mask_local, node_mask)
        h_pair_l = jnp.concatenate(
            [node_l[:, :, None, :] * node_l[:, None, :, :], attr_l], axis=-1
        )
        edge_inv_local = self.grad_local_dist_mlp(h_pair_l).astype(jnp.float32) * inv_sigma

        return edge_inv_global, edge_inv_local, edges, d
