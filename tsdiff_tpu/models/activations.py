"""Activation registry (reference utils/__init__.py:6-11 + utils/activation_functions.py).

The reference's ``activation_loader`` maps "swish" to a custom x*sigmoid(x)
module and otherwise instantiates ``getattr(torch.nn, name)()``.  Production
configs use only "swish" (mlp_act / edge_cat_act, reference
configs/train_config.yml:25-26) plus ReLU inside edge_cat defaults.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def shifted_softplus(x: jax.Array) -> jax.Array:
    """softplus(x) - log(2) (reference models/encoder/schnet.py:65-71)."""
    return jax.nn.softplus(x) - jnp.log(2.0).astype(x.dtype)


_ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "swish": jax.nn.silu,  # x * sigmoid(x)
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
    "ssp": shifted_softplus,
}


def activation_loader(name) -> Callable[[jax.Array], jax.Array]:
    if callable(name):
        return name
    try:
        return _ACTIVATIONS[name.lower()]
    except KeyError as e:
        raise NotImplementedError(f"Unknown activation: {name}") from e
