"""tsdiff_tpu — TPU-native framework for diffusion-based transition-state generation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of seonghann/tsdiff
(arXiv:2304.12233): given the 2D molecular graphs of a reactant and product
(atom-mapped reaction SMARTS ``R>>P``), generate the 3D transition-state
geometry by reverse diffusion over atom coordinates.

Design stance (not a port):
  * Variable-size sparse graphs (PyG edge lists + torch_scatter) are replaced
    by fixed-shape padded dense pair tensors ``(B, N, N, ...)`` — molecules
    have <= ~32 atoms, so the full pair grid is ~1k pairs/graph and maps
    perfectly onto the MXU/VPU with zero dynamic shapes.
  * Graph extension (higher-order adjacency powers) = batched boolean matmuls.
  * Radius graphs = distance-mask thresholding on the dense pair grid.
  * scatter_add aggregation (torch_scatter) = masked dense contractions /
    Pallas kernels.
  * The reverse-diffusion loop (5000 steps x 8 ensemble members) is a single
    jitted ``lax.scan``; the ensemble is a ``vmap`` over stacked param pytrees.
  * Distribution = ``jax.sharding.Mesh`` + NamedSharding (data / ensemble
    axes) with XLA collectives over ICI — the reference has no distributed
    support at all (see SURVEY.md section 2.10).
"""

__version__ = "0.1.0"

from tsdiff_tpu.config import Config, load_config  # noqa: F401
