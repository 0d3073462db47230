from tsdiff_tpu.core.graph import ReactionBatch  # noqa: F401
from tsdiff_tpu.core.graph_ops import (  # noqa: F401
    GraphEdges,
    extend_condensed_graph_edge,
    higher_order_adj,
    pair_mask,
    radius_edge_mask,
)
from tsdiff_tpu.core.geometry import (  # noqa: F401
    center_pos,
    clip_norm,
    eq_transform,
    pairwise_distance,
)
