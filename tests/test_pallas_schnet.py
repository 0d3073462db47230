"""Fused Pallas SchNet stack vs the XLA reference formulation (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from tsdiff_tpu.models.schnet import SchNetStackParams, interaction_stack_xla
from tsdiff_tpu.ops.pallas.schnet_stack import interaction_stack_pallas


def _setup(B=3, N=8, H=16, F=16, E=16, L=2, seed=0):
    params = SchNetStackParams(L, H, F, E).init(jax.random.key(seed))
    weights = SchNetStackParams(L, H, F, E).apply(params)
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    ea = jnp.asarray(rng.normal(size=(B, N, N, E)), jnp.float32)
    m = rng.random((B, N, N)) < 0.5
    m = np.triu(m, 1)
    cmask = jnp.asarray((m | m.transpose(0, 2, 1)).astype(np.float32))
    return weights, h, ea, cmask


def test_pallas_matches_xla():
    weights, h, ea, cmask = _setup()
    want = interaction_stack_xla(weights, h, ea, cmask)
    got = interaction_stack_pallas(weights, h, ea, cmask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_pallas_matches_xla_vmapped_members():
    """vmap over a stacked member axis (the ensemble path)."""
    w1, h, ea, cmask = _setup(seed=1)
    w2, _, _, _ = _setup(seed=2)
    stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), w1, w2)

    want = jax.vmap(lambda w: interaction_stack_xla(w, h, ea, cmask))(stacked)
    got = jax.vmap(
        lambda w: interaction_stack_pallas(w, h, ea, cmask, interpret=True)
    )(stacked)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
