"""One-command parity drill: reference-format checkpoint -> sampling CLI.

Rehearses EXACTLY what happens the day real trained weights land (the
D-MAE-parity run is environment-blocked: the reference ships configs only,
no ``.pt`` weights — BASELINE.md):

  1. build a production-size CondenseEncoderEpsNetwork (H=256, 7 convs,
     feat_dim 25 — reference configs/train_config.yml) and random-init it;
  2. write its weights as a REFERENCE-format checkpoint with the real in-env
     torch: ``torch.save({"config": EasyDict, "model": state_dict,
     "iteration", "avg_val_loss"})`` (reference train.py:220-231), weights in
     torch (out, in) layout;
  3. convert it back with the TORCH-FREE reader
     (tsdiff_tpu.data.torch_reader + data/convert.py — the path real
     artifacts will take) and assert every parameter is BIT-exact;
  4. run the production sampling CLI (reference sampling.py:124-130 flow) on
     a synthetic test set with the converted checkpoint;
  5. independently diff forward scores of converted vs original params.

Run: ``python tools/parity_drill.py [--size production|tiny] [--n_steps N]``.
CPU-safe (forces the CPU backend unless --tpu); ~40 s at production size.
The tiny-size version runs in the suite (tests/test_parity_drill.py).
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import time
import types

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]


def _fake_easydict():
    """Stand-in class pickling as ``easydict.EasyDict`` (absent in this env;
    the reference embeds one in every checkpoint).  Reuses an already-present
    ``easydict`` module (real or previously faked) so the class identity
    matches what pickle resolves."""
    if "easydict" in sys.modules:
        return sys.modules["easydict"].EasyDict
    cls = type("EasyDict", (dict,), {"__module__": "easydict"})
    m = types.ModuleType("easydict")
    m.EasyDict = cls
    sys.modules["easydict"] = m
    return cls


def run_drill(size: str = "production", n_steps: int = 50, scratch: str | None = None,
              use_tpu: bool = False, batch_size: int = 4) -> dict:
    import jax

    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
    import tempfile

    import numpy as np

    from __graft_entry__ import _production_model_config
    from tsdiff_tpu.chem import NUM_BOND_TYPES
    from tsdiff_tpu.data import save_dataset
    from tsdiff_tpu.data.convert import (
        condensenc_state_dict_from_params,
        convert_reference_checkpoint,
    )
    from tsdiff_tpu.models import get_model

    t_start = time.perf_counter()
    cfg = _production_model_config()
    if size == "tiny":
        cfg.hidden_dim = 32
        cfg.encoder.hidden_dim = 32
        cfg.encoder.num_convs = 2
        cfg.num_diffusion_timesteps = 50
        cfg.t1 = 50
    scratch = scratch or tempfile.mkdtemp(prefix="parity_drill_")

    # 1. production model, random init
    rng = np.random.default_rng(0)
    n_pad = 16
    graphs = []
    for _ in range(batch_size):
        n = int(rng.integers(8, n_pad + 1))
        bm = np.zeros((n, n), np.int64)
        for i in range(n - 1):
            bm[i, i + 1] = bm[i + 1, i] = 1 * NUM_BOND_TYPES + 1
        bm[0, n - 1] = bm[n - 1, 0] = 1 * NUM_BOND_TYPES + 0
        graphs.append(dict(
            atom_type=rng.integers(1, 9, size=n).astype(np.int32),
            r_feat=(rng.random((n, cfg.feat_dim)) < 0.3).astype(np.float32),
            p_feat=(rng.random((n, cfg.feat_dim)) < 0.3).astype(np.float32),
            pos=rng.normal(scale=1.5, size=(n, 3)).astype(np.float32),
            bond_mat=bm,
        ))
    from tsdiff_tpu.core.graph import from_numpy_graphs

    batch = from_numpy_graphs(graphs, max_nodes=n_pad)
    model = get_model(cfg)
    params = model.init(
        jax.random.key(0), batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    n_params = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(params))

    # 2. reference-format torch checkpoint (real torch, reference layout)
    import torch

    EasyDict = _fake_easydict()

    def as_easydict(d):
        return EasyDict({
            k: as_easydict(v) if isinstance(v, dict) else v
            for k, v in dict(d).items()
        })

    sd = collections.OrderedDict(
        (k, torch.from_numpy(np.ascontiguousarray(v)))
        for k, v in condensenc_state_dict_from_params(
            params, cfg.encoder.num_convs
        ).items()
    )
    pt_path = f"{scratch}/400000.pt"
    torch.save(
        {"config": as_easydict({"model": cfg.to_dict()}),
         "model": sd, "iteration": 400000, "avg_val_loss": 0.123},
        pt_path,
    )

    # 3. torch-free conversion; parameters must round-trip BIT-exact
    ck_path = f"{scratch}/converted.ckpt"
    ck = convert_reference_checkpoint(pt_path, out_path=ck_path)
    assert ck["iteration"] == 400000
    orig = dict(jax.tree_util.tree_leaves_with_path(params))
    conv = dict(jax.tree_util.tree_leaves_with_path(ck["params"]))
    assert orig.keys() == conv.keys()
    for path, a in orig.items():
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(conv[path]), err_msg=str(path)
        )

    # 4. the production sampling CLI consumes the converted checkpoint
    from tsdiff_tpu.cli import sampling

    test_pkl = f"{scratch}/test.pkl"
    save_dataset(test_pkl, graphs)
    out_dir = f"{scratch}/samples"
    sampling.main([
        ck_path, "--test_set", test_pkl, "--save_dir", out_dir,
        "--n_steps", str(n_steps), "--batch_size", str(batch_size),
    ])
    import pickle

    with open(f"{out_dir}/samples_all.pkl", "rb") as f:
        samples = pickle.load(f)
    assert len(samples) == batch_size
    for s in samples:
        assert np.isfinite(s["pos_gen"]).all()

    # 5. independent forward diff (converted vs original params)
    out1, _, _ = model.apply(
        params, batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    out2, _, _ = model.apply(
        ck["params"], batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    score_diff = float(np.abs(np.asarray(out1) - np.asarray(out2)).max())
    assert score_diff == 0.0, f"forward scores differ by {score_diff}"

    wall = time.perf_counter() - t_start
    return {
        "size": size,
        "n_params": int(n_params),
        "bit_exact_roundtrip": True,
        "score_diff": score_diff,
        "sampled": len(samples),
        "wall_s": round(wall, 1),
        "scratch": scratch,
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--size", choices=["production", "tiny"], default="production")
    parser.add_argument("--n_steps", type=int, default=50)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--scratch", type=str, default=None)
    parser.add_argument("--tpu", action="store_true", default=False,
                        help="run the sampling leg on the default backend "
                             "instead of forcing CPU")
    args = parser.parse_args(argv)
    res = run_drill(size=args.size, n_steps=args.n_steps, scratch=args.scratch,
                    use_tpu=args.tpu, batch_size=args.batch_size)
    print("PARITY DRILL PASSED:", res)
    return res


if __name__ == "__main__":
    main()
