"""Custom-VJP fused stack: gradients vs jax.grad of the XLA formulation."""

import numpy as np
import jax
import jax.numpy as jnp

from tsdiff_tpu.models.schnet import SchNetStackParams, interaction_stack_xla
from tsdiff_tpu.ops.pallas.schnet_stack_vjp import interaction_stack_pallas_trainable

from test_pallas_schnet import _setup


def test_fused_vjp_matches_xla_grads():
    weights, h, ea, cmask = _setup(B=2, N=8, H=16, F=16, E=16, L=2, seed=3)

    def loss_xla(w, h_, ea_):
        out = interaction_stack_xla(w, h_, ea_, cmask)
        return jnp.sum(out * out)

    def loss_pallas(w, h_, ea_):
        out = interaction_stack_pallas_trainable(
            w, h_, ea_, cmask, jnp.float32, True  # dtype, interpret
        )
        return jnp.sum(out * out)

    # primal parity
    np.testing.assert_allclose(
        float(loss_pallas(weights, h, ea)), float(loss_xla(weights, h, ea)),
        rtol=1e-5,
    )

    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(weights, h, ea)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(weights, h, ea)

    for k in gx[0]:
        np.testing.assert_allclose(
            np.asarray(gp[0][k]), np.asarray(gx[0][k]), rtol=5e-4, atol=5e-5,
            err_msg=f"weight grad {k}",
        )
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gp[2]), np.asarray(gx[2]), rtol=5e-4, atol=5e-5)
