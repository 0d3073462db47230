"""Fully-fused condensed score kernel vs the XLA score_step (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from tsdiff_tpu.config import Config
from tsdiff_tpu.models import get_model

from test_condensenc import MODEL_CFG, make_batch


def test_fused_score_matches_xla(monkeypatch):
    # force interpret mode inside the fused path (CPU test env)
    import tsdiff_tpu.ops.pallas.condensed_score as cs

    orig = cs.condensed_score_pallas

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    rng = np.random.default_rng(0)
    batch = make_batch(rng, [5, 8, 11])
    cfg = Config(MODEL_CFG.to_dict())
    model_x = get_model(cfg)
    cfg.fused_score = True
    model_f = get_model(cfg)
    assert model_f.fused_score

    params = model_x.init(
        jax.random.key(0),
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )

    ei_x, edges_x, d_x = model_x.apply(
        params, batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )

    monkeypatch.setattr(cs, "condensed_score_pallas", interp)
    import tsdiff_tpu.models.condensenc  # noqa: F401  (uses the patched fn via module import)

    ei_f, edges_f, d_f = model_f.apply(
        params, batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )

    m = np.asarray(edges_x.mask_global)
    np.testing.assert_array_equal(m, np.asarray(edges_f.mask_global))
    np.testing.assert_allclose(np.asarray(d_x), np.asarray(d_f), rtol=1e-6)
    # compare edge scores on valid edges (off-edge values are don't-care)
    a = np.asarray(ei_x)[..., 0][m]
    b = np.asarray(ei_f)[..., 0][m]
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
