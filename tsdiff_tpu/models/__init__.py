"""Model registry (reference models/epsnet/__init__.py:1-15).

``get_model(config.model)`` dispatches on ``config.network``.  The reference's
``dualenc_general`` branch imports a nonexistent module and is dead code; it
is intentionally not carried over.
"""

from tsdiff_tpu.models.condensenc import CondenseEncoderEpsNetwork  # noqa: F401
from tsdiff_tpu.models.edge import (  # noqa: F401
    GaussianSmearingEdgeEncoder,
    MLPEdgeEncoder,
    get_edge_encoder,
)
from tsdiff_tpu.models.schnet import SchNetEncoder  # noqa: F401


def _lazy_encoders():
    from tsdiff_tpu.models.comenet import ComENetEncoder
    from tsdiff_tpu.models.dimenetpp import DimeNetPPEncoder
    from tsdiff_tpu.models.egnn import EGNNMixed2DEncoder
    from tsdiff_tpu.models.gin import GINEncoder

    return {
        "schnet": SchNetEncoder,
        "gin": GINEncoder,
        "egnn": EGNNMixed2DEncoder,
        "dimenetpp": DimeNetPPEncoder,
        "comenet": ComENetEncoder,
    }


def load_encoder(config, key: str, dtype=None):
    """Encoder registry (reference models/encoder/__init__.py:10-22):
    dispatch on ``config[key].name`` and build via ``from_config``."""
    enc_config = config[key]
    return _lazy_encoders()[enc_config.name].from_config(enc_config, dtype=dtype)


def get_model(config, dtype=None):
    if config.network == "condensenc":
        return CondenseEncoderEpsNetwork.from_config(config, dtype=dtype)
    elif config.network == "dualenc":
        from tsdiff_tpu.models.dualenc import DualEncoderEpsNetwork

        return DualEncoderEpsNetwork.from_config(config, dtype=dtype)
    raise NotImplementedError(f"Unknown network: {config.network}")
