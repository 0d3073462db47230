"""Eval layer: D-MAE, automorphisms, alignment, clustering, COV/MAT."""

import numpy as np

from tsdiff_tpu.eval import (
    CovMatEvaluator,
    calc_dmae,
    cluster_conformers,
    graph_automorphisms,
    kabsch_align,
    rotate_transform_mirror,
)
from tsdiff_tpu.eval.covmat import best_rmsd_numpy, rmsd_confusion_matrix
from tsdiff_tpu.eval.dmae import dmae_for_graph, get_min_dmae_match


def test_calc_dmae_basics():
    pos = np.random.default_rng(0).normal(size=(6, 3))
    assert calc_dmae(pos, pos) == 0.0
    shifted = pos + 3.0  # translation-invariant
    np.testing.assert_allclose(calc_dmae(pos, shifted), 0.0, atol=1e-12)
    assert calc_dmae(pos, pos * 1.5) > 0


def test_graph_automorphisms_methyl_like():
    """Central atom with 3 identical leaves: 3! = 6 automorphisms."""
    bond = np.zeros((4, 4), dtype=np.int64)
    for leaf in (1, 2, 3):
        bond[0, leaf] = bond[leaf, 0] = 23  # same condensed type
    atom_type = np.array([6, 1, 1, 1])
    autos = graph_automorphisms(bond, atom_type)
    assert len(autos) == 6
    for m in autos:
        assert m[0] == 0  # center fixed


def test_min_dmae_match_resolves_permutation():
    rng = np.random.default_rng(1)
    bond = np.zeros((4, 4), dtype=np.int64)
    for leaf in (1, 2, 3):
        bond[0, leaf] = bond[leaf, 0] = 23
    atom_type = np.array([6, 1, 1, 1])
    autos = graph_automorphisms(bond, atom_type)
    pos = rng.normal(size=(4, 3))
    # permute two symmetric leaves: D-MAE under matching must be ~0
    perm = np.array([0, 2, 1, 3])
    val, match = get_min_dmae_match(pos, pos[perm], autos)
    np.testing.assert_allclose(val, 0.0, atol=1e-12)


def test_kabsch_and_mirror():
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(7, 3))
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    moved = pos @ q + 5.0
    aligned = kabsch_align(pos, moved)
    np.testing.assert_allclose(aligned, pos, atol=1e-8)
    # mirrored geometry recovered via the mirror branch
    mirrored = pos @ np.diag([1.0, 1.0, -1.0])
    back = rotate_transform_mirror(pos, mirrored)
    np.testing.assert_allclose(back, pos, atol=1e-8)


def test_cluster_conformers_two_groups():
    rng = np.random.default_rng(3)
    base_a = rng.normal(size=(5, 3))
    base_b = base_a + rng.normal(scale=2.0, size=(5, 3))
    confs = [base_a + rng.normal(scale=0.01, size=(5, 3)) for _ in range(3)] + [
        base_b + rng.normal(scale=0.01, size=(5, 3)) for _ in range(3)
    ]
    matches = [tuple(range(5))]
    stat = cluster_conformers(confs, matches, thresh=0.10)
    assert stat["num_clusters"] == 2
    c = stat["clusters"]
    assert len(set(c[:3])) == 1 and len(set(c[3:])) == 1 and c[0] != c[3]


def test_best_rmsd_and_covmat():
    rng = np.random.default_rng(4)
    n = 6
    pos_ref = rng.normal(size=(2, n, 3))
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    # generated = rotated copies of refs + one garbage
    pos_gen = np.stack([pos_ref[0] @ q, pos_ref[1] @ q, rng.normal(size=(n, 3)) * 3])
    assert best_rmsd_numpy(pos_gen[0], pos_ref[0]) < 1e-6

    data = dict(
        atom_type=np.array([6] * n),
        pos_ref=pos_ref,
        pos_gen=np.concatenate([pos_gen, pos_gen[2:]]),  # 4 gen = 2*ratio
        smiles="A>>B",
    )
    ev = CovMatEvaluator(num_workers=1, thresholds=np.array([0.5]))
    res = ev([data])
    assert res.CoverageR.shape == (1, 1)
    assert res.CoverageR[0, 0] == 1.0  # every ref matched by a rotated gen
    assert res.MatchingR[0] < 1e-6


def test_dmae_for_graph():
    rng = np.random.default_rng(5)
    n = 5
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    ei = np.array([[i, i + 1] for i in range(n - 1)]).T
    ei = np.concatenate([ei, ei[::-1]], axis=1)
    g = dict(
        atom_type=np.array([6, 6, 8, 1, 1]),
        pos=pos,
        edge_index=ei,
        edge_type=np.full(ei.shape[1], 23),
    )
    assert dmae_for_graph(g, pos) == 0.0
    assert dmae_for_graph(g, pos + rng.normal(scale=0.3, size=pos.shape)) > 0.0
