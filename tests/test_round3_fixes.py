"""Regression tests for the round-3 advisor fixes (ADVICE.md round 2).

1. Protein DSM loss: the train-edge-replaced distances feed ONLY d_target and
   the global cutoff mask; eq_transform edge lengths stay the original
   perturbed distances (reference dualenc.py:1033-1086).
2. restore_opt_state: orbax integer-string dict keys order numerically, so
   optax chains with >10 elements don't scramble.
3. chi1 accuracy excludes residues whose sidechain atoms were never scored
   (coverage_counts == 0 -> pos_gen == input ground truth).
"""

import numpy as np
import jax
import jax.numpy as jnp

from tsdiff_tpu.core.geometry import eq_transform
from tsdiff_tpu.diffusion.dual_objective import _branch_losses
from tsdiff_tpu.models.dualenc import DualEdges


def _manual_global_loss(eg, mask_global, mask_local, d_pert, d_cutoff, d_target,
                        pos, cutoff):
    """Reference dualenc.py:1047-1072 semantics, straight-line numpy/jnp."""
    gm = ((d_cutoff <= cutoff) | mask_local) & ~mask_local & mask_global
    tgt = jnp.where(gm, d_target, 0.0)
    pred = jnp.where(gm, eg, 0.0)
    # eq_transform edge lengths = ORIGINAL perturbed distances
    t_pos = eq_transform(tgt, pos, mask_global, d_pert)
    n_pos = eq_transform(pred, pos, mask_global, d_pert)
    return jnp.sum((n_pos - t_pos) ** 2, axis=-1)


def test_branch_losses_d_cutoff_semantics():
    """An edge whose perturbed length is beyond the cutoff but whose replaced
    length is inside must enter the global mask, while eq_transform still
    sees the perturbed length."""
    rng = np.random.default_rng(0)
    B, N = 1, 4
    pos = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    full = ~np.eye(N, dtype=bool)[None]
    mask_global = jnp.asarray(full)
    mask_local = jnp.zeros((B, N, N), bool).at[0, 0, 1].set(True).at[0, 1, 0].set(True)

    d_pert = jnp.asarray(rng.uniform(1.0, 3.0, size=(B, N, N)), jnp.float32)
    # masked/diagonal entries get a safe nonzero length (eq_transform divides)
    d_pert = jnp.where(mask_global, (d_pert + jnp.swapaxes(d_pert, 1, 2)) / 2, 1.0)
    # pair (2,3): perturbed length 5.0 (outside cutoff 4), replaced 2.0 (inside)
    d_pert = d_pert.at[0, 2, 3].set(5.0).at[0, 3, 2].set(5.0)
    d_cutoff = d_pert.at[0, 2, 3].set(2.0).at[0, 3, 2].set(2.0)

    eg = jnp.asarray(rng.normal(size=(B, N, N)), jnp.float32)
    d_target = jnp.asarray(rng.normal(size=(B, N, N)), jnp.float32)
    edges = DualEdges(mask_global=mask_global, mask_local=mask_local,
                      edge_type=jnp.zeros((B, N, N), jnp.int32))

    lg, _ = _branch_losses(
        eg, jnp.zeros_like(eg), edges, d_pert, None, pos, d_target,
        cutoff=4.0, d_cutoff=d_cutoff,
    )
    expect = _manual_global_loss(
        eg, mask_global, mask_local, d_pert, d_cutoff, d_target, pos, 4.0
    )
    np.testing.assert_allclose(np.asarray(lg), np.asarray(expect), rtol=1e-6)

    # sanity: the (2,3) edge really flips the mask — without d_cutoff the
    # loss must differ
    lg_plain, _ = _branch_losses(
        eg, jnp.zeros_like(eg), edges, d_pert, None, pos, d_target, cutoff=4.0
    )
    assert not np.allclose(np.asarray(lg), np.asarray(lg_plain))


def test_dsm_loss_all_sidechain_matches_plain():
    """is_sidechain all-True makes every edge a train edge -> replacement is
    a no-op and the loss equals the molecule path."""
    from test_dualenc import CFG_DSM, make_legacy_batch
    from tsdiff_tpu.diffusion.dual_objective import dual_dsm_loss
    from tsdiff_tpu.models import get_model

    rng = np.random.default_rng(1)
    batch = make_legacy_batch(rng, [5, 6], n_pad=8, ts=False)
    model = get_model(CFG_DSM)
    params = model.init(
        jax.random.key(0), batch.atom_type, batch.pos, batch.bond_mat,
        batch.node_mask, time_step=jnp.zeros((2,), jnp.int32),
    )
    l0, _ = dual_dsm_loss(model, params, batch, jax.random.key(3))
    l1, _ = dual_dsm_loss(
        model, params, batch, jax.random.key(3),
        is_sidechain=jnp.ones(batch.node_mask.shape, bool),
    )
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)


def test_restore_opt_state_many_element_chain():
    """12-leaf tuple restored from orbax-style {"0": ..., "11": ...} dicts:
    lexicographic key order would scramble ("10" < "2"); numeric order must
    round-trip."""
    from tsdiff_tpu.train.trainer import restore_opt_state

    template = tuple(np.zeros((2,), np.float32) for _ in range(12))
    values = [np.full((2,), float(i), np.float32) for i in range(12)]
    restored_dict = {str(i): values[i] for i in range(12)}
    out = restore_opt_state(template, restored_dict)
    for i, leaf in enumerate(out):
        np.testing.assert_array_equal(np.asarray(leaf), values[i])


def test_chi1_skips_uncovered_residues():
    from tsdiff_tpu.eval.protein import chi1_accuracy

    # two SER residues, atoms [N, CA, CB, OG] each
    names = ["N", "CA", "CB", "OG"] * 2
    graph = {
        "atom2res": np.repeat([0, 1], 4),
        "atom_name": names,
        "res_name": ["SER"] * 8,
    }
    res = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float
    )  # chi1 = 0 deg
    pos_gt = np.concatenate([res, res + 10.0])
    pos_gen = pos_gt.copy()
    # residue 0 was scored and its OG swung to chi1 = 180 deg (wrong);
    # residue 1 never scored (counts 0), pos_gen still equals the input gt
    pos_gen[3] = [2, 1, 0]
    counts = np.array([1, 1, 1, 1, 0, 0, 0, 0])

    acc_all, n_all = chi1_accuracy(pos_gen, pos_gt, graph)
    assert n_all == 2 and acc_all == 0.5  # inflated by the frozen residue

    acc, n = chi1_accuracy(pos_gen, pos_gt, graph, coverage_counts=counts)
    assert n == 1 and acc == 0.0  # only the scored residue counts
