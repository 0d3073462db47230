"""Protein PDB pipeline: parsing, template bonds, sidechain flags, subgraph
sampling, and sidechain-mode losses/samplers.

Capability under test mirrors reference utils/datasets.py:223-328
(``pdb_to_data``), :1129-1208 (``SidechainConformationDataset``) and the
``is_sidechain`` paths of models/epsnet/dualenc.py (radius restriction
common.py:343-368, train-edge mask dualenc.py:1226-1233, backbone pinning
dualenc.py:796-797 and 956-957).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsdiff_tpu.chem import BOND_TYPES
from tsdiff_tpu.config import Config
from tsdiff_tpu.core.graph import from_numpy_graphs
from tsdiff_tpu.data.pdb import (
    SidechainConformationDataset,
    cover_protein_with_subgraphs,
    pack_sidechain_mask,
    parse_pdb,
    pdb_to_graph,
    sample_sidechain_subgraph,
)
from tsdiff_tpu.diffusion.dual_objective import (
    accumulate_protein_eps,
    dsm_annealed_sampling,
    dual_dsm_loss,
    dual_dynamic_sampling,
    is_train_edge_mask,
)
from tsdiff_tpu.diffusion.sampler import SamplingSettings
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
from tsdiff_tpu.models import get_model


def _atom_line(serial, name, resname, chain, resnum, x, y, z, element):
    nm = f" {name:<3s}" if len(name) < 4 else name
    return (
        f"ATOM  {serial:>5d} {nm:<4s} {resname:<3s} {chain}{resnum:>4d}    "
        f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}          {element:>2s}"
    )


def dipeptide_pdb():
    """ALA-SER dipeptide, plausible coordinates, heavy atoms only."""
    rows = [
        # ALA 1
        ("N", "ALA", 1, (0.0, 0.0, 0.0), "N"),
        ("CA", "ALA", 1, (1.46, 0.0, 0.0), "C"),
        ("C", "ALA", 1, (2.0, 1.4, 0.0), "C"),
        ("O", "ALA", 1, (1.3, 2.4, 0.0), "O"),
        ("CB", "ALA", 1, (2.0, -0.8, -1.2), "C"),
        # SER 2
        ("N", "SER", 2, (3.3, 1.5, 0.0), "N"),
        ("CA", "SER", 2, (4.0, 2.8, 0.0), "C"),
        ("C", "SER", 2, (5.5, 2.6, 0.1), "C"),
        ("O", "SER", 2, (6.1, 1.6, -0.3), "O"),
        ("CB", "SER", 2, (3.6, 3.6, 1.25), "C"),
        ("OG", "SER", 2, (2.2, 3.8, 1.3), "O"),
        ("OXT", "SER", 2, (6.2, 3.6, 0.6), "O"),
    ]
    lines = [
        _atom_line(i + 1, n, rn, "A", ri, *xyz, el)
        for i, (n, rn, ri, xyz, el) in enumerate(rows)
    ]
    return "\n".join(lines) + "\nTER\nEND\n"


def test_parse_pdb_columns():
    atoms = parse_pdb(dipeptide_pdb())
    assert len(atoms) == 12
    assert atoms.name[:5] == ["N", "CA", "C", "O", "CB"]
    assert atoms.resname[0] == "ALA" and atoms.resname[-1] == "SER"
    assert atoms.element[10] == "O"
    np.testing.assert_allclose(atoms.pos[1], [1.46, 0.0, 0.0], atol=1e-6)
    assert atoms.resnum.tolist() == [1] * 5 + [2] * 7


def test_pdb_to_graph_flags_and_bonds():
    g = pdb_to_graph(dipeptide_pdb(), name="dipep")
    assert g is not None
    # backbone/sidechain split: CB (ALA), CB+OG (SER) are sidechain; OXT is not
    assert g["is_sidechain"].tolist() == [
        False, False, False, False, True,
        False, False, False, False, True, True, False,
    ]
    assert g["is_alpha"].tolist() == [
        False, True, False, False, False,
        False, True, False, False, False, False, False,
    ]
    assert g["atom2res"].tolist() == [0] * 5 + [1] * 7
    # each atom maps to its residue's CA
    assert g["atom2alpha_index"].tolist() == [1] * 5 + [6] * 7
    assert g["atom_type"].tolist() == [7, 6, 6, 8, 6, 7, 6, 6, 8, 6, 8, 8]

    ei, et = g["edge_index"], g["edge_type"]
    pairs = {(int(i), int(j)): int(t) for i, j, t in zip(ei[0], ei[1], et)}
    S, D = BOND_TYPES["SINGLE"], BOND_TYPES["DOUBLE"]
    assert pairs[(0, 1)] == S          # N-CA
    assert pairs[(1, 4)] == S          # CA-CB
    assert pairs[(2, 3)] == D          # C=O
    assert pairs[(2, 5)] == S          # peptide C(1)-N(2)
    assert pairs[(9, 10)] == S         # SER CB-OG
    assert pairs[(7, 11)] == S         # C-OXT
    assert (5, 9) not in pairs         # N-CB not bonded
    # symmetric
    for (i, j), t in pairs.items():
        assert pairs[(j, i)] == t
    # row-major sorted like the reference (utils/datasets.py:303-305)
    keys = ei[0] * 12 + ei[1]
    assert (np.diff(keys) >= 0).all()


def test_insertion_codes_separate_residues():
    """Residues 100 and 100A (insertion code, col 27) stay distinct."""
    rows = [
        ("N", "ALA", (0.0, 0.0, 0.0), "N", " "),
        ("CA", "ALA", (1.46, 0.0, 0.0), "C", " "),
        ("C", "ALA", (2.0, 1.4, 0.0), "C", " "),
        ("O", "ALA", (1.3, 2.4, 0.0), "O", " "),
        ("CB", "ALA", (2.0, -0.8, -1.2), "C", " "),
        ("N", "SER", (3.3, 1.5, 0.0), "N", "A"),
        ("CA", "SER", (4.0, 2.8, 0.0), "C", "A"),
        ("C", "SER", (5.5, 2.6, 0.1), "C", "A"),
        ("O", "SER", (6.1, 1.6, -0.3), "O", "A"),
        ("CB", "SER", (3.6, 3.6, 1.25), "C", "A"),
        ("OG", "SER", (2.2, 3.8, 1.3), "O", "A"),
    ]
    lines = []
    for i, (nm, rn, xyz, el, ic) in enumerate(rows):
        line = _atom_line(i + 1, nm, rn, "A", 100, *xyz, el)
        line = line[:26] + ic + line[27:]  # insertion code column 27
        lines.append(line)
    g = pdb_to_graph("\n".join(lines))
    assert g["atom2res"].tolist() == [0] * 5 + [1] * 6
    # both residues have their own CA and internal bonds; peptide C(100)-N(100A)
    pairs = {(int(i), int(j)) for i, j in zip(*g["edge_index"])}
    assert (2, 5) in pairs   # peptide bond by distance despite equal resnum
    assert (9, 10) in pairs  # SER CB-OG intact in the inserted residue


def test_gly_only_returns_none():
    rows = [("N", "GLY", 1, (0, 0, 0), "N"), ("CA", "GLY", 1, (1.5, 0, 0), "C"),
            ("C", "GLY", 1, (2, 1.4, 0), "C"), ("O", "GLY", 1, (1.3, 2.4, 0), "O")]
    lines = [_atom_line(i + 1, n, rn, "A", ri, *xyz, el)
             for i, (n, rn, ri, xyz, el) in enumerate(rows)]
    assert pdb_to_graph("\n".join(lines)) is None


def _protein_chain(n_res=6, seed=0):
    """Synthetic ALA chain along x, one PDB text."""
    rng = np.random.default_rng(seed)
    lines, serial = [], 1
    for r in range(1, n_res + 1):
        base = np.array([3.5 * r, 0.0, 0.0])
        for name, off, el in [
            ("N", (0, 0, 0), "N"), ("CA", (1.4, 0, 0), "C"),
            ("C", (2.1, 1.2, 0), "C"), ("O", (1.6, 2.3, 0), "O"),
            ("CB", (1.8, -0.9, 1.2), "C"),
        ]:
            xyz = base + np.asarray(off) + rng.normal(scale=0.02, size=3)
            lines.append(_atom_line(serial, name, "ALA", "A", r, *xyz, el))
            serial += 1
    return "\n".join(lines) + "\nEND\n"


def test_subgraph_residue_completeness():
    g = pdb_to_graph(_protein_chain(8))
    rng = np.random.default_rng(1)
    sub = sample_sidechain_subgraph(g, rng, cutoff=6.0)
    assert sub is not None
    # every kept residue is complete: 5 atoms per ALA residue
    res, counts = np.unique(sub["atom2res"], return_counts=True)
    assert (counts == 5).all()
    assert sub["is_sidechain"].any()
    # remapped edges are in-range and reference the same bond structure
    ei = sub["edge_index"]
    assert ei.min() >= 0 and ei.max() < len(sub["atom_type"])
    # a small cutoff keeps a strict subset
    assert len(sub["atom_type"]) < len(g["atom_type"])


def test_subgraph_fix_deterministic():
    g = pdb_to_graph(_protein_chain(8))
    a = sample_sidechain_subgraph(g, np.random.default_rng(0), 6.0, fix_subgraph=True)
    b = sample_sidechain_subgraph(g, np.random.default_rng(7), 6.0, fix_subgraph=True)
    np.testing.assert_array_equal(a["atom_type"], b["atom_type"])
    np.testing.assert_array_equal(a["edge_index"], b["edge_index"])


def test_dataset_and_mask_packing():
    g = pdb_to_graph(_protein_chain(8))
    ds = SidechainConformationDataset([g, g], cutoff=6.0, seed=0)
    subs = [ds[i] for i in range(len(ds))]
    subs = [s for s in subs if s is not None]
    n_pad = max(len(s["atom_type"]) for s in subs)
    batch = from_numpy_graphs(subs, max_nodes=n_pad)
    sc = pack_sidechain_mask(subs, n_pad)
    assert sc.shape == (len(subs), n_pad)
    # padding slots are backbone (False)
    assert not sc[~np.asarray(batch.node_mask)].any()


CFG_DSM = Config(dict(
    network="dualenc", hidden_dim=16, num_convs=2, num_convs_local=2,
    cutoff=10.0, mlp_act="relu", beta_schedule="sigmoid", beta_start=1e-7,
    beta_end=2e-3, num_diffusion_timesteps=50, edge_order=3,
    edge_encoder="mlp", smooth_conv=False, type="dsm",
    sigma_begin=10.0, sigma_end=0.01, num_noise_level=10,
))


def _protein_batch(n_pad=16):
    g = pdb_to_graph(_protein_chain(3))
    batch = from_numpy_graphs([g], max_nodes=n_pad)
    sc = jnp.asarray(pack_sidechain_mask([g], n_pad))
    return batch, sc


def test_is_train_edge_mask():
    sc = jnp.asarray([[True, False, False]])
    full = jnp.ones((1, 3, 3), bool)
    m = is_train_edge_mask(full, sc)
    # edges touching atom 0 train; the backbone-backbone (1,2) edge does not
    assert m[0, 1, 2].item() is False and m[0, 2, 1].item() is False
    assert m[0, 0, 1].item() is True and m[0, 2, 0].item() is True


@pytest.mark.heavy
def test_dsm_loss_sidechain_mode():
    batch, sc = _protein_batch()
    model = get_model(CFG_DSM)
    params = model.init(
        jax.random.PRNGKey(0), batch.atom_type, batch.pos, batch.bond_mat,
        batch.node_mask, time_step=jnp.zeros((1,), jnp.int32),
    )
    key = jax.random.PRNGKey(1)
    loss_sc, _ = dual_dsm_loss(model, params, batch, key, is_sidechain=sc)
    assert np.isfinite(float(loss_sc))
    # all-sidechain mask degenerates to the unrestricted loss
    loss_all, _ = dual_dsm_loss(
        model, params, batch, key, is_sidechain=batch.node_mask
    )
    loss_none, _ = dual_dsm_loss(model, params, batch, key)
    np.testing.assert_allclose(float(loss_all), float(loss_none), rtol=1e-6)


def test_sampler_backbone_pinning():
    batch, sc = _protein_batch()
    schedule = DiffusionSchedule.from_config(CFG_DSM)
    pos_gt = batch.pos

    def eps_fn(pos, gate, time_step=None):
        return jnp.ones_like(pos)  # constant drift: every free atom moves

    settings = SamplingSettings(n_steps=5, sampling_type="ld")
    pos, _, nan_flag = dual_dynamic_sampling(
        eps_fn, schedule, batch.pos, batch.node_mask, jax.random.PRNGKey(0),
        settings, is_sidechain=sc, pos_gt=pos_gt,
    )
    backbone = np.asarray(~sc & batch.node_mask)
    np.testing.assert_array_equal(
        np.asarray(pos)[backbone], np.asarray(pos_gt)[backbone]
    )
    moved = np.asarray(pos)[np.asarray(sc)] - np.asarray(pos_gt)[np.asarray(sc)]
    assert np.abs(moved).max() > 0
    assert not bool(nan_flag)

    sigmas = np.geomspace(1.0, 0.01, 5)
    pos2, _, _ = dsm_annealed_sampling(
        eps_fn, sigmas, batch.pos, batch.node_mask, jax.random.PRNGKey(0),
        n_steps=3, step_lr=1e-4, is_sidechain=sc, pos_gt=pos_gt,
    )
    np.testing.assert_array_equal(
        np.asarray(pos2)[backbone], np.asarray(pos_gt)[backbone]
    )


def test_cover_protein_with_subgraphs():
    g = pdb_to_graph(_protein_chain(12, seed=2))
    subs = cover_protein_with_subgraphs(g, np.random.default_rng(0), cutoff=6.0)
    assert len(subs) >= 2  # 12 residues along x at 3.5 A spacing > one ball
    # every alpha carbon is in some subgraph (full coverage)
    covered = np.zeros(len(g["atom_type"]), bool)
    for s in subs:
        covered[s["mapping"]] = True
        # residue-complete
        _, counts = np.unique(s["atom2res"], return_counts=True)
        assert (counts == 5).all()
        assert s["is_sidechain"].any()
    assert covered[np.asarray(g["is_alpha"], bool)].all()


@pytest.mark.heavy
def test_accumulate_protein_eps():
    g = pdb_to_graph(_protein_chain(12, seed=2))
    model = get_model(CFG_DSM)
    n_pad = 16
    batch = from_numpy_graphs([g], max_nodes=80)
    params = model.init(
        jax.random.PRNGKey(0),
        batch.atom_type[:, :n_pad], batch.pos[:, :n_pad],
        batch.bond_mat[:, :n_pad, :n_pad], batch.node_mask[:, :n_pad],
        time_step=jnp.zeros((1,), jnp.int32),
    )
    eps, counts = accumulate_protein_eps(
        model, params, g, cutoff=6.0, batch_size=4, seed=0
    )
    n = len(g["atom_type"])
    assert eps.shape == (n, 3) and counts.shape == (n,)
    assert np.isfinite(eps).all()
    assert (counts[np.asarray(g["is_alpha"], bool)] > 0).all()
    assert np.abs(eps[counts > 0]).sum() > 0


def test_preprocessing_cli_pdb_mode(tmp_path):
    from tsdiff_tpu.cli import preprocessing
    from tsdiff_tpu.data.dataset import load_dataset

    (tmp_path / "a.pdb").write_text(_protein_chain(4, seed=0))
    (tmp_path / "b.pdb").write_text(_protein_chain(6, seed=1))
    # a GLY-only chain gets skipped
    rows = [("N", "GLY", 1, (0, 0, 0), "N"), ("CA", "GLY", 1, (1.5, 0, 0), "C"),
            ("C", "GLY", 1, (2, 1.4, 0), "C"), ("O", "GLY", 1, (1.3, 2.4, 0), "O")]
    (tmp_path / "c.pdb").write_text("\n".join(
        _atom_line(i + 1, n, rn, "A", ri, *xyz, el)
        for i, (n, rn, ri, xyz, el) in enumerate(rows)))

    preprocessing.main([
        "--pdb_glob", str(tmp_path / "*.pdb"), "--save_dir", str(tmp_path / "out"),
    ])
    graphs, _ = load_dataset(str(tmp_path / "out" / "proteins.pkl"))
    assert len(graphs) == 2
    assert all("is_sidechain" in g for g in graphs)
    assert {len(g["atom_type"]) for g in graphs} == {20, 30}


def test_write_pdb_roundtrip():
    text = _protein_chain(4, seed=7)
    g = pdb_to_graph(text)
    from tsdiff_tpu.data.pdb import write_pdb
    g2 = pdb_to_graph(write_pdb(g))
    np.testing.assert_allclose(g2["pos"], g["pos"], atol=1e-3)
    assert g2["atom_type"].tolist() == g["atom_type"].tolist()
    assert g2["is_sidechain"].tolist() == g["is_sidechain"].tolist()
    np.testing.assert_array_equal(g2["edge_index"], g["edge_index"])


@pytest.mark.heavy
def test_protein_sampling_cli(tmp_path):
    """preprocessing --pdb_glob -> train-free ckpt -> protein_sampling CLI."""
    from tsdiff_tpu.cli import preprocessing, protein_sampling
    from tsdiff_tpu.train import (init_train_state, make_optimizer,
                                  save_checkpoint)
    from tsdiff_tpu.train.trainer import TrainState

    (tmp_path / "a.pdb").write_text(_protein_chain(5, seed=0))
    preprocessing.main([
        "--pdb_glob", str(tmp_path / "*.pdb"), "--save_dir", str(tmp_path),
    ])

    model = get_model(CFG_DSM)
    g = pdb_to_graph(_protein_chain(5, seed=0))
    batch = from_numpy_graphs([g], max_nodes=32)
    params = model.init(
        jax.random.PRNGKey(0), batch.atom_type, batch.pos, batch.bond_mat,
        batch.node_mask, time_step=jnp.zeros((1,), jnp.int32),
    )
    state = TrainState(params=params, opt_state=None, step=jnp.asarray(0))
    ckpt = str(tmp_path / "0.ckpt")
    save_checkpoint(ckpt, Config(model=CFG_DSM.to_dict()), state)

    protein_sampling.main([
        ckpt, "--protein_set", str(tmp_path / "proteins.pkl"),
        "--save_dir", str(tmp_path / "gen"), "--n_steps", "4",
        "--step_lr", "1e-6", "--cutoff", "7.0", "--write_pdb",
    ])
    import pickle
    res = pickle.load(open(tmp_path / "gen" / "proteins_gen.pkl", "rb"))
    assert len(res) == 1
    r = res[0]
    backbone = ~r["is_sidechain"]
    np.testing.assert_array_equal(r["pos_gen"][backbone], r["pos_gt"][backbone])
    assert (r["coverage_counts"][r["is_sidechain"]] > 0).all()
    assert np.isfinite(r["pos_gen"]).all()
    # a regenerated PDB was written and reparses
    pdbs = list((tmp_path / "gen").glob("*_gen.pdb"))
    assert len(pdbs) == 1
    g2 = pdb_to_graph(pdbs[0].read_text())
    assert g2 is not None and len(g2["atom_type"]) == len(g["atom_type"])


def test_batch_carries_sidechain_mask():
    """from_numpy_graphs packs is_sidechain (padding False) when present."""
    g = pdb_to_graph(_protein_chain(4, seed=0))
    b = from_numpy_graphs([g], max_nodes=32)
    assert b.is_sidechain is not None
    sc = np.asarray(b.is_sidechain)
    np.testing.assert_array_equal(sc[0, :20], np.asarray(g["is_sidechain"]))
    assert not sc[0, 20:].any()
    # molecule graphs (no mask) produce None
    mol = dict(g)
    mol.pop("is_sidechain")
    assert from_numpy_graphs([mol], max_nodes=32).is_sidechain is None


@pytest.mark.heavy
def test_train_cli_sidechain_mode(tmp_path):
    """Full protein training workflow: --pdb_glob dataset -> train CLI with
    dataset.type=sidechain -> checkpoint -> protein_sampling CLI."""
    import yaml
    from tsdiff_tpu.cli import preprocessing, protein_sampling
    from tsdiff_tpu.cli import train as train_cli

    for i, nres in enumerate((5, 7)):
        (tmp_path / f"p{i}.pdb").write_text(_protein_chain(nres, seed=i))
    preprocessing.main([
        "--pdb_glob", str(tmp_path / "*.pdb"), "--save_dir", str(tmp_path),
    ])
    prot = str(tmp_path / "proteins.pkl")

    config = {
        "model": dict(CFG_DSM.to_dict()),
        "train": {
            "seed": 0, "batch_size": 4, "val_freq": 4, "log_freq": 4,
            "max_iters": 4, "max_grad_norm": 3000.0, "anneal_power": 2.0,
            "optimizer": {"type": "adam", "lr": 5.0e-4, "weight_decay": 0.0,
                          "beta1": 0.95, "beta2": 0.999},
            "scheduler": {"type": "plateau", "factor": 0.8, "patience": 10,
                          "min_lr": 1.25e-4},
        },
        "dataset": {"type": "sidechain", "train": prot, "val": prot,
                    "cutoff": 8.0, "subgraphs_per_protein": 4},
    }
    (tmp_path / "config.yml").write_text(yaml.safe_dump(config))
    log_dir = train_cli.main([str(tmp_path / "config.yml"),
                              "--logdir", str(tmp_path / "logs")])
    import glob as _glob
    ckpts = _glob.glob(f"{log_dir}/checkpoints/*.ckpt")
    assert ckpts
    out = protein_sampling.main([
        ckpts[0], "--protein_set", prot, "--save_dir", str(tmp_path / "gen"),
        "--n_steps", "3",
    ])
    import pickle
    res = pickle.load(open(out, "rb"))
    assert len(res) == 2 and all(np.isfinite(r["pos_gen"]).all() for r in res)


def test_covering_subgraphs_carry_center():
    g = pdb_to_graph(_protein_chain(12, seed=2))
    subs = cover_protein_with_subgraphs(g, np.random.default_rng(0), cutoff=6.0)
    for s in subs:
        assert 0 <= s["center"] < len(g["atom_type"])
        assert not g["is_sidechain"][s["center"]]  # centers are alpha carbons


@pytest.mark.heavy
def test_protein_sampling_diffusion_mode():
    """Diffusion-mode protein sampling defaults to the FULL schedule and
    returns physical-frame, finite coordinates with the backbone exact."""
    from tsdiff_tpu.diffusion.protein import sample_protein_sidechains

    cfg = Config(dict(CFG_DSM.to_dict()))
    cfg.type = "diffusion"
    model = get_model(cfg)
    schedule = DiffusionSchedule.from_config(cfg)
    g = pdb_to_graph(_protein_chain(10, seed=5))
    batch = from_numpy_graphs([g], max_nodes=56)
    params = model.init(
        jax.random.PRNGKey(0), batch.atom_type, batch.pos, batch.bond_mat,
        batch.node_mask,
    )
    pos, counts, nan = sample_protein_sidechains(
        model, params, g, jax.random.PRNGKey(1), schedule=schedule,
        cutoff=7.0, step_lr=1e-7, clip=20.0,
    )
    backbone = ~np.asarray(g["is_sidechain"], bool)
    np.testing.assert_array_equal(pos[backbone], np.asarray(g["pos"])[backbone])
    assert np.isfinite(pos).all()
    assert (counts[np.asarray(g["is_sidechain"], bool)] > 0).all()
    # n_steps beyond the schedule is clamped, not an error
    pos2, _, _ = sample_protein_sidechains(
        model, params, g, jax.random.PRNGKey(1), schedule=schedule,
        cutoff=7.0, n_steps=10 ** 6, step_lr=1e-7, clip=20.0,
    )
    assert np.isfinite(pos2).all()


def test_protein_ownership_never_averages(monkeypatch):
    """Overlapping covering subgraphs must not blend rotamers: every
    residue's sidechain displacement equals ONE subgraph's prediction."""
    import tsdiff_tpu.diffusion.protein as protein_mod
    from tsdiff_tpu.diffusion.protein import sample_protein_sidechains

    g = pdb_to_graph(_protein_chain(12, seed=2))
    model = get_model(CFG_DSM)
    batch0 = from_numpy_graphs([g], max_nodes=72)
    params = model.init(
        jax.random.PRNGKey(0), batch0.atom_type, batch0.pos, batch0.bond_mat,
        batch0.node_mask, time_step=jnp.zeros((1,), jnp.int32),
    )

    # fake sampler: each subgraph b returns gt + a distinct constant offset
    calls = []

    def fake_dsm(eps_fn, sigmas, pos_init, node_mask, key, **kw):
        pos_gt = kw["pos_gt"]
        B = pos_gt.shape[0]
        offs = (jnp.arange(B, dtype=jnp.float32) + 1 + len(calls) * 10)[:, None, None]
        calls.append(B)
        sc3 = kw["is_sidechain"][..., None]
        return jnp.where(sc3, pos_gt + offs, pos_gt), None, False

    monkeypatch.setattr(protein_mod, "dsm_annealed_sampling", fake_dsm)
    # batch_size=1 so every subgraph gets a distinct offset
    pos, counts, nan = sample_protein_sidechains(
        model, params, g, jax.random.PRNGKey(1), cutoff=6.0, batch_size=1,
    )
    sc = np.asarray(g["is_sidechain"], bool)
    atom2res = np.asarray(g["atom2res"])
    disp = pos - np.asarray(g["pos"])
    offsets_seen = set()
    for r in np.unique(atom2res[sc]):
        rows = disp[sc & (atom2res == r)]
        vals = np.unique(np.round(rows, 5))
        # all 3 components of all sidechain atoms of a residue share one
        # exact offset -> came from exactly one subgraph, no averaging
        assert len(vals) == 1, (r, vals)
        offsets_seen.add(float(vals[0]))
    assert len(offsets_seen) >= 2  # multiple subgraphs actually contributed
    np.testing.assert_array_equal(pos[~sc], np.asarray(g["pos"])[~sc])


def test_radius_restriction_in_model():
    """With is_sidechain, non-bonded backbone-backbone pairs get no radius
    edge (reference common.py:343-368)."""
    batch, sc = _protein_batch()
    model = get_model(CFG_DSM)
    edges_full = model.build_edges(batch.bond_mat, batch.pos, batch.node_mask)
    edges_sc = model.build_edges(
        batch.bond_mat, batch.pos, batch.node_mask, is_sidechain=sc
    )
    mg_full = np.asarray(edges_full.mask_global)
    mg_sc = np.asarray(edges_sc.mask_global)
    scn = np.asarray(sc)
    bb_pair = ~scn[:, :, None] & ~scn[:, None, :]
    typed = np.asarray(edges_sc.mask_local)
    # restricted is a subset of full; removed edges are exactly non-typed
    # backbone-backbone pairs
    assert (mg_sc <= mg_full).all()
    removed = mg_full & ~mg_sc
    assert removed.any()
    assert (removed <= (bb_pair & ~typed)).all()
    # typed (order-extended) edges always survive
    assert (typed <= mg_sc).all()


def test_evaluate_cli_protein_mode(tmp_path, capsys):
    import pickle
    from tsdiff_tpu.cli import evaluate

    res = [
        dict(name="a", pos_gen=np.ones((6, 3), np.float32) * 2,
             pos_gt=np.ones((6, 3), np.float32),
             is_sidechain=np.array([0, 0, 1, 1, 0, 1], bool),
             coverage_counts=np.array([0, 0, 1, 1, 0, 0]), nan=False),
        dict(name="b", pos_gen=np.zeros((4, 3), np.float32),
             pos_gt=np.zeros((4, 3), np.float32),
             is_sidechain=np.array([0, 1, 0, 0], bool),
             coverage_counts=np.zeros(4, int), nan=True),
    ]
    p = tmp_path / "proteins_gen.pkl"
    p.write_bytes(pickle.dumps(res))
    stats = evaluate.main(["--samples", str(p), "--protein"])
    # protein a: covered sidechain atoms 2,3 displaced by (1,1,1) -> sqrt(3)
    np.testing.assert_allclose(stats["sidechain_rmsd"], [np.sqrt(3.0)], rtol=1e-6)
    # protein b is fully diverged (uncovered + nan): its NaN flag must still
    # be counted even though it is skipped for RMSD
    assert stats["nan_flagged"] == 1
    out = capsys.readouterr().out
    assert "1 proteins evaluated" in out and "1 with no covered" in out
    assert "1 NaN-flagged" in out


def test_chi1_dihedral_hand_computed():
    """chi1 machinery vs pencil-derived dihedrals on a synthetic SER."""
    from tsdiff_tpu.eval.protein import (angular_diff_deg, chi1_accuracy,
                                         chi1_quads, dihedral_deg)

    def ser_graph(g_pos):
        return dict(
            atom_type=np.array([7, 6, 6, 8, 6, 8], np.int32),
            atom2res=np.zeros(6, np.int64),
            atom_name=["N", "CA", "C", "O", "CB", "OG"],
            res_name=["SER"] * 6,
            pos=np.array([[0.0, 0, 0], [1, 0, 0], [2, -1, 0], [2, -2, 0],
                          [1, 1, 0], list(g_pos)], np.float32),
        )

    g = ser_graph([0.0, 1, 0])
    quads = chi1_quads(g)
    np.testing.assert_array_equal(quads, [[0, 1, 4, 5]])  # N-CA-CB-OG
    # hand-derived: cis (OG eclipsing N) -> 0 deg
    np.testing.assert_allclose(dihedral_deg(g["pos"], quads), [0.0], atol=1e-6)
    # OG at (0,1,1): atan2(-1, 1) = -45 deg
    np.testing.assert_allclose(
        dihedral_deg(ser_graph([0, 1, 1])["pos"], quads), [-45.0], atol=1e-5)
    # trans: OG at (2,1,0) -> 180 deg
    np.testing.assert_allclose(
        np.abs(dihedral_deg(ser_graph([2, 1, 0])["pos"], quads)), [180.0], atol=1e-5)

    # accuracy tolerance: identical conformation is a hit...
    gt = ser_graph([0, 1, 1])
    acc, n = chi1_accuracy(gt["pos"], gt["pos"], gt)
    assert (acc, n) == (1.0, 1)
    far = ser_graph([2, 1, 0])  # 180 vs -45: diff 135 > 40
    acc, n = chi1_accuracy(far["pos"], gt["pos"], gt)
    assert (acc, n) == (0.0, 1)
    # circular difference wraps: 170 vs -170 is 20 apart
    np.testing.assert_allclose(
        angular_diff_deg(np.array([170.0]), np.array([-170.0])), [20.0])
    # ALA-only graph has no chi1
    ala = dict(atom_type=np.zeros(5, np.int32), atom2res=np.zeros(5, np.int64),
               atom_name=["N", "CA", "C", "O", "CB"], res_name=["ALA"] * 5,
               pos=np.zeros((5, 3), np.float32))
    acc, n = chi1_accuracy(ala["pos"], ala["pos"], ala)
    assert n == 0 and np.isnan(acc)


def test_rotamer_distribution():
    """Rotamer-well assignment + circular concentration on hand-set chi1s."""
    from tsdiff_tpu.eval.protein import place_dihedral, rotamer_distribution

    def chain(chis):
        """One SER residue per requested chi1, gamma placed by NeRF.

        NOTE the sign convention: place_dihedral's dih argument lands at
        MINUS the measured dihedral_deg value (same flip the protein gate
        documents at its CHI1 constant) — callers below pass -chi."""
        atoms, names, res = [], [], []
        for r, chi in enumerate(chis):
            base = np.array([4.0 * r, 0.0, 0.0])
            N, CA, C, O = (base, base + [1.4, 0, 0],
                           base + [2.1, 1.2, 0], base + [1.6, 2.3, 0])
            CB = place_dihedral(C, N, CA, 1.53, 110.5, 122.0)
            OG = place_dihedral(N, CA, CB, 1.42, 110.5, chi)
            atoms += [N, CA, C, O, CB, OG]
            names += ["N", "CA", "C", "O", "CB", "OG"]
            res += [r] * 6
        return dict(
            atom_type=np.zeros(len(names), np.int32),
            atom2res=np.asarray(res, np.int64),
            atom_name=names, res_name=["SER"] * len(names),
            pos=np.asarray(atoms, np.float32),
        )

    # all at one well (measured +60 = g+): occupancy 1.0 there, R ~ 1
    g = chain([-62.0, -58.0, -61.0, -60.0])
    d = rotamer_distribution(g["pos"], g)
    assert d["n"] == 4
    assert d["wells"]["g+"] == 1.0 and d["wells"]["t"] == 0.0
    assert d["circ_R"] > 0.99
    assert abs(d["circ_mean_deg"] - 60.0) < 5.0

    # spread across all three wells: R collapses
    g = chain([-60.0, 180.0, 60.0])  # measured: +60, 180, -60
    d = rotamer_distribution(g["pos"], g)
    assert d["wells"] == {"g+": pytest.approx(1 / 3), "t": pytest.approx(1 / 3),
                          "g-": pytest.approx(1 / 3)}
    assert d["circ_R"] < 0.05

    # coverage filter: mask out the gamma atoms of residues 1..2
    cov = np.ones(18, np.int64)
    cov[6 * 1 + 5] = 0
    cov[6 * 2 + 5] = 0
    d = rotamer_distribution(g["pos"], g, coverage_counts=cov)
    assert d["n"] == 1 and d["wells"]["g+"] == 1.0


def test_parse_pdb_robustness():
    """Messy real-world PDB text: hydrogens, altlocs, HETATM, multi-model,
    missing element column."""
    lines = [
        "HEADER    TEST",
        "REMARK  1 whatever",
        _atom_line(1, "N", "ALA", "A", 1, 0, 0, 0, "N"),
        # hydrogen -> skipped by default
        _atom_line(2, "H", "ALA", "A", 1, 0.5, 0.5, 0, "H"),
        # altloc B -> skipped (keep A/blank only)
        _atom_line(3, "CA", "ALA", "A", 1, 1.4, 0, 0, "C")[:16] + "B" +
        _atom_line(3, "CA", "ALA", "A", 1, 1.4, 0, 0, "C")[17:],
        _atom_line(4, "CA", "ALA", "A", 1, 1.45, 0, 0, "C"),
        # HETATM (water) -> skipped
        "HETATM    5  O   HOH A 201      9.000   9.000   9.000  1.00  0.00           O",
        # element column blank -> inferred from the atom-name columns
        _atom_line(6, "C", "ALA", "A", 1, 2.1, 1.2, 0, "C")[:76] + "  ",
        _atom_line(7, "O", "ALA", "A", 1, 1.6, 2.3, 0, "O"),
        _atom_line(8, "CB", "ALA", "A", 1, 1.8, -0.9, 1.2, "C"),
        "ENDMDL",
        # second model must be ignored entirely
        _atom_line(9, "N", "GLY", "A", 2, 50, 50, 50, "N"),
    ]
    atoms = parse_pdb("\n".join(lines))
    assert atoms.name == ["N", "CA", "C", "O", "CB"]
    assert atoms.element == ["N", "C", "C", "O", "C"]
    np.testing.assert_allclose(atoms.pos[1], [1.45, 0, 0], atol=1e-6)
    # altloc A variant kept exactly once, model 2 dropped
    assert len(atoms) == 5
    g = pdb_to_graph("\n".join(lines))
    assert g is not None and len(g["atom_type"]) == 5
