"""Generic MLP matching the reference's MultiLayerPerceptron semantics
(reference models/common.py:46-90): Dense layers with activation between all
but the last layer, no dropout/activation on the output.

Initialization follows torch.nn.Linear defaults (uniform
+-1/sqrt(fan_in) for weight and bias) so training dynamics are comparable;
exact bitwise parity with torch RNG is out of scope (SURVEY.md section 7).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax

from tsdiff_tpu.models.activations import activation_loader

# U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — torch.nn.Linear's default.
torch_linear_init = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_bias_init(key, shape, dtype, fan_in: int):
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """nn.Dense with torch-default initialization."""

    features: int
    use_bias: bool = True
    dtype: jax.typing.DTypeLike | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_linear_init,
            bias_init=lambda k, s, d: torch_bias_init(k, s, d, fan_in),
            dtype=self.dtype,
        )(x)


class MLP(nn.Module):
    """Multi-layer perceptron; no activation on the last layer."""

    hidden_dims: Sequence[int]
    activation: str = "relu"
    dtype: jax.typing.DTypeLike | None = None

    @nn.compact
    def __call__(self, x):
        act = activation_loader(self.activation)
        for i, dim in enumerate(self.hidden_dims):
            x = TorchLinear(dim, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < len(self.hidden_dims) - 1:
                x = act(x)
        return x
