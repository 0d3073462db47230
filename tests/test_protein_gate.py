"""Quantitative protein sidechain gate (round-3; VERDICT round-2 item 6).

The TS path has an 8x D-MAE learning gate; this is the protein equivalent:
train the dual-encoder DSM sidechain model on synthetic SER chains whose
chi1 rotamer is CONSISTENT (gauche+, ~+60 deg — a learnable rule), then
regenerate sidechains of HELD-OUT chains from pure noise through the
production protein_sampling CLI and require:

  * sidechain RMSD well below the untrained model's;
  * chi1 accuracy (40-deg tolerance, coverage-filtered) above BOTH baselines:
      - the untrained model (random geometry);
      - a template-rotamer baseline that rebuilds every gamma atom at the
        WRONG canonical rotamer (trans, 180 deg) from the true backbone
        frame — a perfect-geometry/wrong-rotamer strawman the model must
        beat by actually learning the corpus rotamer.

Training uses the same loss/optimizer as the train CLI but batched into
jitted lax.scan chunks so the slow test stays minutes, not tens of minutes
(the full CLI-trained workflow at 6k iters is the per-round DEMO run).
"""

import pickle

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tsdiff_tpu.config import Config
from tsdiff_tpu.core.graph import from_numpy_graphs
from tsdiff_tpu.data.pdb import (
    SidechainConformationDataset,
    pack_sidechain_mask,
    pdb_to_graph,
)
from tsdiff_tpu.diffusion.dual_objective import dual_dsm_loss
from tsdiff_tpu.eval.protein import chi1_accuracy, chi1_quads, place_dihedral
from tsdiff_tpu.models import get_model
from tsdiff_tpu.train import save_checkpoint
from tsdiff_tpu.train.trainer import TrainState

from test_pdb import _atom_line

CHI1 = -60.0  # generator setting; lands at +60 deg under our sign convention


def ser_chain(n_res: int, seed: int, chi1: float = CHI1, noise: float = 0.02) -> str:
    """Synthetic SER chain whose every chi1 sits at one canonical rotamer."""
    rng = np.random.default_rng(seed)
    lines, serial = [], 1
    for r in range(1, n_res + 1):
        base = np.array([3.5 * r, 0.0, 0.0])
        N = base
        CA = base + np.array([1.4, 0, 0.0])
        C = base + np.array([2.1, 1.2, 0.0])
        O = base + np.array([1.6, 2.3, 0.0])
        CB = place_dihedral(C, N, CA, 1.53, 110.5, 122.0)
        OG = place_dihedral(N, CA, CB, 1.42, 110.5, chi1)
        for name, xyz, el in [("N", N, "N"), ("CA", CA, "C"), ("C", C, "C"),
                              ("O", O, "O"), ("CB", CB, "C"), ("OG", OG, "O")]:
            xyz = xyz + rng.normal(scale=noise, size=3)
            lines.append(_atom_line(serial, name, "SER", "A", r, *xyz, el))
            serial += 1
    return "\n".join(lines) + "\nEND\n"


CFG = Config(dict(
    network="dualenc", hidden_dim=64, num_convs=3, num_convs_local=3,
    cutoff=10.0, mlp_act="relu", beta_schedule="sigmoid", beta_start=1e-7,
    beta_end=2e-3, num_diffusion_timesteps=50, edge_order=3,
    edge_encoder="mlp", smooth_conv=False, type="dsm",
    sigma_begin=10.0, sigma_end=0.01, num_noise_level=10,
))


def _metrics_from_results(results):
    """(mean covered sidechain RMSD, coverage-filtered chi1 accuracy, n)."""
    rms, hits, ntot = [], 0.0, 0
    for r in results:
        sc = np.asarray(r["is_sidechain"], bool)
        cov = np.asarray(r["coverage_counts"])[sc] > 0
        d = np.asarray(r["pos_gen"])[sc][cov] - np.asarray(r["pos_gt"])[sc][cov]
        rms.append(float(np.sqrt((d ** 2).sum(-1).mean())))
        acc, n = chi1_accuracy(
            r["pos_gen"], r["pos_gt"], r, coverage_counts=r["coverage_counts"]
        )
        if n:
            hits += acc * n
            ntot += n
    return float(np.mean(rms)), (hits / ntot if ntot else float("nan")), ntot


@pytest.mark.slow
def test_protein_gate_chi1_and_rmsd(tmp_path):
    from tsdiff_tpu.cli import protein_sampling

    # corpus: 6 train chains; 2 HELD-OUT chains for evaluation
    train_graphs = [pdb_to_graph(ser_chain(6 + (i % 3), seed=i)) for i in range(6)]
    test_specs = [(6, 6), (8, 7)]
    test_graphs = [pdb_to_graph(ser_chain(n, seed=s)) for n, s in test_specs]
    from tsdiff_tpu.data import save_dataset

    test_pkl = str(tmp_path / "test.pkl")
    save_dataset(test_pkl, test_graphs)

    # fixed subgraph batch (the corpus is small; chains are residue-complete
    # at this cutoff) — same objective/optimizer family as the train CLI
    ds = SidechainConformationDataset(train_graphs, cutoff=8.0, seed=0)
    subs = [s for s in (ds[i] for i in range(len(ds))) if s is not None][:8]
    n_pad = 8 * ((max(len(s["atom_type"]) for s in subs) + 7) // 8)
    batch = from_numpy_graphs(subs, max_nodes=n_pad)
    sc = jnp.asarray(pack_sidechain_mask(subs, n_pad))

    model = get_model(CFG)
    params0 = model.init(
        jax.random.PRNGKey(0), batch.atom_type, batch.pos, batch.bond_mat,
        batch.node_mask,
        time_step=jnp.zeros((batch.atom_type.shape[0],), jnp.int32),
    )
    opt = optax.adam(3e-4)

    @jax.jit
    def train_chunk(params, ost, key):
        def body(carry, k):
            p, o = carry
            (loss, _), grads = jax.value_and_grad(
                lambda q: dual_dsm_loss(model, q, batch, k, is_sidechain=sc),
                has_aux=True,
            )(p)
            upd, o = opt.update(grads, o)
            return (optax.apply_updates(p, upd), o), loss
        (params, ost), losses = jax.lax.scan(
            body, (params, ost), jax.random.split(key, 100)
        )
        return params, ost, losses[-1]

    params, ost = params0, opt.init(params0)
    for c in range(40):  # 4000 iters
        params, ost, loss = train_chunk(params, ost, jax.random.PRNGKey(c))
    assert np.isfinite(float(loss))

    def sample_with(p, tag):
        ck = str(tmp_path / f"{tag}.ckpt")
        save_checkpoint(ck, Config(model=CFG.to_dict()),
                        TrainState(params=p, opt_state=None, step=jnp.asarray(0)))
        out = protein_sampling.main([
            ck, "--protein_set", test_pkl,
            "--save_dir", str(tmp_path / f"gen_{tag}"),
            "--cutoff", "8.0", "--step_lr", "1e-5", "--seed", "7",
        ])
        with open(out, "rb") as f:
            return pickle.load(f)

    rms_tr, chi1_tr, n_tr = _metrics_from_results(sample_with(params, "trained"))
    rms_un, chi1_un, n_un = _metrics_from_results(sample_with(params0, "untrained"))
    assert n_tr > 0

    # template-rotamer baseline: perfect backbone geometry, WRONG canonical
    # rotamer (trans 180) — chi1 is off by ~120 deg on every residue
    hits_b, n_b, rms_b = 0.0, 0, []
    for g in test_graphs:
        pos = np.asarray(g["pos"], float).copy()
        for (iN, iCA, iCB, iG) in chi1_quads(g):
            pos[iG] = place_dihedral(pos[iN], pos[iCA], pos[iCB], 1.42, 110.5, 180.0)
        acc, n = chi1_accuracy(pos, g["pos"], g)
        sc_g = np.asarray(g["is_sidechain"], bool)
        d = pos[sc_g] - np.asarray(g["pos"])[sc_g]
        rms_b.append(float(np.sqrt((d ** 2).sum(-1).mean())))
        hits_b += acc * n
        n_b += n
    chi1_baseline = hits_b / n_b
    assert chi1_baseline < 0.1  # the strawman really is at the wrong rotamer

    print(f"\nprotein gate: trained RMSD {rms_tr:.3f} chi1 {chi1_tr:.2f} | "
          f"untrained RMSD {rms_un:.3f} chi1 {chi1_un:.2f} | "
          f"template-180 RMSD {np.mean(rms_b):.3f} chi1 {chi1_baseline:.2f}")

    # THE GATE.  Calibration on this exact setup (4000 scan iters):
    # trained RMSD 2.42 / chi1 0.50, untrained RMSD 3.66 / chi1 0.21,
    # template-180 chi1 0.00.  The 6k-iter CLI-trained run reaches RMSD
    # 1.84 / chi1 0.54 with the untrained model DIVERGING (see DEMO.md).
    # Thresholds leave 20-30% margin around the calibration point:
    assert np.isfinite(rms_tr) and rms_tr < 3.0, rms_tr
    assert chi1_tr >= 0.35, chi1_tr
    # untrained either diverges or is clearly worse on both metrics
    assert (not np.isfinite(rms_un)) or rms_tr < 0.85 * rms_un, (rms_tr, rms_un)
    assert n_un == 0 or chi1_tr >= chi1_un + 0.1, (chi1_tr, chi1_un)
    assert chi1_tr >= chi1_baseline + 0.3, (chi1_tr, chi1_baseline)
