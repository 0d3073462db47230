"""Converters from the reference's on-disk formats.

A user switching from the PyTorch reference brings two kinds of artifacts:

  * trained checkpoints (``<iter>.pt``: {"config", "model": state_dict, ...},
    reference train.py:220-231) — convert with
    :func:`convert_reference_checkpoint`.  Torch is NOT required: the zip
    serialization format is read directly by
    :mod:`tsdiff_tpu.data.torch_reader` (stdlib zipfile + a restricted
    unpickler that materializes tensor storages as numpy);
  * PyG dataset pickles (lists of torch_geometric Data) — convert with
    :func:`convert_reference_dataset`; torch_geometric and rdkit are NOT
    required (absent modules are stubbed for unpickling via
    :mod:`tsdiff_tpu.data.pyg_compat`).

Name mapping for CondenseEncoderEpsNetwork (torch Linear weights are
(out, in) and transpose to jax kernels (in, out)):

  atom_embedding.weight                       -> atom_embedding/embedding
  atom_feat_embedding.weight                  -> atom_feat_embedding/Dense_0/kernel^T
  edge_encoder.bond_emb.weight                -> edge_enc/bond_emb/embedding
  edge_encoder.mlp.layers.{i}.*               -> edge_enc/mlp/layers_{i}/Dense_0/*
  edge_cat.{0,2}.*                            -> edge_cat/{lin0,lin1}/Dense_0/*
  encoder.interactions.{l}.conv.mlp.{0,2}.*   -> encoder/stack/{f1,f2}{w,b}[l]
  encoder.interactions.{l}.conv.lin1.weight   -> encoder/stack/l1w[l]
  encoder.interactions.{l}.conv.lin2.*        -> encoder/stack/l2{w,b}[l]
  encoder.interactions.{l}.lin.*              -> encoder/stack/o{w,b}[l]
  grad_dist_mlp.layers.{i}.*                  -> grad_dist_mlp/layers_{i}/Dense_0/*
"""

from __future__ import annotations

import numpy as np


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def condensenc_params_from_state_dict(state_dict: dict, num_convs: int) -> dict:
    """Reference CondenseEncoderEpsNetwork state_dict (numpy arrays) -> flax
    params pytree matching tsdiff_tpu/models/condensenc.py."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def dense(prefix):
        out = {"kernel": _t(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return {"Dense_0": out}

    stack = {
        "f1w": np.stack([_t(sd[f"encoder.interactions.{l}.conv.mlp.0.weight"]) for l in range(num_convs)]),
        "f1b": np.stack([sd[f"encoder.interactions.{l}.conv.mlp.0.bias"] for l in range(num_convs)]),
        "f2w": np.stack([_t(sd[f"encoder.interactions.{l}.conv.mlp.2.weight"]) for l in range(num_convs)]),
        "f2b": np.stack([sd[f"encoder.interactions.{l}.conv.mlp.2.bias"] for l in range(num_convs)]),
        "l1w": np.stack([_t(sd[f"encoder.interactions.{l}.conv.lin1.weight"]) for l in range(num_convs)]),
        "l2w": np.stack([_t(sd[f"encoder.interactions.{l}.conv.lin2.weight"]) for l in range(num_convs)]),
        "l2b": np.stack([sd[f"encoder.interactions.{l}.conv.lin2.bias"] for l in range(num_convs)]),
        "ow": np.stack([_t(sd[f"encoder.interactions.{l}.lin.weight"]) for l in range(num_convs)]),
        "ob": np.stack([sd[f"encoder.interactions.{l}.lin.bias"] for l in range(num_convs)]),
    }

    params = {
        "atom_embedding": {"embedding": sd["atom_embedding.weight"]},
        "atom_feat_embedding": {
            "Dense_0": {"kernel": _t(sd["atom_feat_embedding.weight"])}
        },
        "edge_enc": {
            "bond_emb": {"embedding": sd["edge_encoder.bond_emb.weight"]},
            "mlp": {
                "layers_0": dense("edge_encoder.mlp.layers.0"),
                "layers_1": dense("edge_encoder.mlp.layers.1"),
            },
        },
        "edge_cat": {
            "lin0": dense("edge_cat.0"),
            "lin1": dense("edge_cat.2"),
        },
        "encoder": {"stack": stack},
        "grad_dist_mlp": {
            "layers_0": dense("grad_dist_mlp.layers.0"),
            "layers_1": dense("grad_dist_mlp.layers.1"),
            "layers_2": dense("grad_dist_mlp.layers.2"),
        },
    }
    return {"params": params}


def condensenc_state_dict_from_params(params: dict, num_convs: int) -> dict:
    """Inverse of :func:`condensenc_params_from_state_dict`: flax params ->
    torch-style state_dict (numpy, torch (out, in) weight layout).

    Used by the parity drill (tools/parity_drill.py) to synthesize
    reference-format checkpoints with the real in-env torch, and by the
    conversion roundtrip tests."""
    p = params["params"] if "params" in params else params
    sd = {}

    def put_dense(prefix, d):
        sd[f"{prefix}.weight"] = _t(d["Dense_0"]["kernel"])
        if "bias" in d["Dense_0"]:
            sd[f"{prefix}.bias"] = np.asarray(d["Dense_0"]["bias"])

    sd["atom_embedding.weight"] = np.asarray(p["atom_embedding"]["embedding"])
    sd["atom_feat_embedding.weight"] = _t(p["atom_feat_embedding"]["Dense_0"]["kernel"])
    sd["edge_encoder.bond_emb.weight"] = np.asarray(p["edge_enc"]["bond_emb"]["embedding"])
    put_dense("edge_encoder.mlp.layers.0", p["edge_enc"]["mlp"]["layers_0"])
    put_dense("edge_encoder.mlp.layers.1", p["edge_enc"]["mlp"]["layers_1"])
    put_dense("edge_cat.0", p["edge_cat"]["lin0"])
    put_dense("edge_cat.2", p["edge_cat"]["lin1"])
    st = p["encoder"]["stack"]
    for l in range(num_convs):
        sd[f"encoder.interactions.{l}.conv.mlp.0.weight"] = _t(st["f1w"][l])
        sd[f"encoder.interactions.{l}.conv.mlp.0.bias"] = np.asarray(st["f1b"][l])
        sd[f"encoder.interactions.{l}.conv.mlp.2.weight"] = _t(st["f2w"][l])
        sd[f"encoder.interactions.{l}.conv.mlp.2.bias"] = np.asarray(st["f2b"][l])
        sd[f"encoder.interactions.{l}.conv.lin1.weight"] = _t(st["l1w"][l])
        sd[f"encoder.interactions.{l}.conv.lin2.weight"] = _t(st["l2w"][l])
        sd[f"encoder.interactions.{l}.conv.lin2.bias"] = np.asarray(st["l2b"][l])
        sd[f"encoder.interactions.{l}.lin.weight"] = _t(st["ow"][l])
        sd[f"encoder.interactions.{l}.lin.bias"] = np.asarray(st["ob"][l])
    for i in range(3):
        put_dense(f"grad_dist_mlp.layers.{i}", p["grad_dist_mlp"][f"layers_{i}"])
    return sd


def dualenc_params_from_state_dict(state_dict: dict, config: dict) -> dict:
    """Reference DualEncoderEpsNetwork state_dict (numpy arrays) -> flax
    params pytree matching tsdiff_tpu/models/dualenc.py.

    Name mapping (reference dualenc.py:60-200; torch Linear (out, in)
    transposes to jax (in, out)):

      edge_encoder_{global,local}.bond_emb.weight -> edge_encoder_*/bond_emb/embedding
      edge_encoder_*.mlp.layers.{i}.*             -> edge_encoder_*/mlp/layers_{i}/Dense_0/*
      edge_cat_{global,local}.{0,2}.*             -> edge_cat_*/{lin0,lin1}/Dense_0/*   (TS mode)
      encoder_global.node_emb.weight              -> encoder_global/node_emb/embedding
      encoder_global.interactions.{l}.*           -> encoder_global/stack/* (layer-stacked)
      encoder_local.node_emb.weight               -> encoder_local/node_emb/embedding
      encoder_local.convs.{i}.nn.layers.{j}.*     -> encoder_local/convs_{i}/nn/layers_{j}/Dense_0/*
      grad_{global,local}_dist_mlp.layers.{i}.*   -> grad_*_dist_mlp/layers_{i}/Dense_0/*

    ``convs.{i}.eps`` buffers are dropped (train_eps is False everywhere in
    the reference, our GINEConv fixes eps=0); sigmas/betas/alphas buffers
    are recomputed from the config.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    num_convs = config["model"]["num_convs"]
    num_convs_local = config["model"]["num_convs_local"]
    ts_mode = bool(config["model"].get("TS", False))
    if config["model"].get("edge_encoder", "mlp") != "mlp":
        raise NotImplementedError(
            "dualenc conversion supports the mlp edge encoder "
            "(gaussian adds no parameters besides bond_emb; extend here)"
        )

    def dense(prefix):
        out = {"kernel": _t(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return {"Dense_0": out}

    def edge_encoder(side):
        return {
            "bond_emb": {"embedding": sd[f"edge_encoder_{side}.bond_emb.weight"]},
            "mlp": {
                "layers_0": dense(f"edge_encoder_{side}.mlp.layers.0"),
                "layers_1": dense(f"edge_encoder_{side}.mlp.layers.1"),
            },
        }

    def mlp3(prefix):
        return {f"layers_{i}": dense(f"{prefix}.layers.{i}") for i in range(3)}

    stack = {
        "f1w": np.stack([_t(sd[f"encoder_global.interactions.{l}.conv.mlp.0.weight"]) for l in range(num_convs)]),
        "f1b": np.stack([sd[f"encoder_global.interactions.{l}.conv.mlp.0.bias"] for l in range(num_convs)]),
        "f2w": np.stack([_t(sd[f"encoder_global.interactions.{l}.conv.mlp.2.weight"]) for l in range(num_convs)]),
        "f2b": np.stack([sd[f"encoder_global.interactions.{l}.conv.mlp.2.bias"] for l in range(num_convs)]),
        "l1w": np.stack([_t(sd[f"encoder_global.interactions.{l}.conv.lin1.weight"]) for l in range(num_convs)]),
        "l2w": np.stack([_t(sd[f"encoder_global.interactions.{l}.conv.lin2.weight"]) for l in range(num_convs)]),
        "l2b": np.stack([sd[f"encoder_global.interactions.{l}.conv.lin2.bias"] for l in range(num_convs)]),
        "ow": np.stack([_t(sd[f"encoder_global.interactions.{l}.lin.weight"]) for l in range(num_convs)]),
        "ob": np.stack([sd[f"encoder_global.interactions.{l}.lin.bias"] for l in range(num_convs)]),
    }

    params = {
        "edge_encoder_global": edge_encoder("global"),
        "edge_encoder_local": edge_encoder("local"),
        "encoder_global": {
            "node_emb": {"embedding": sd["encoder_global.node_emb.weight"]},
            "stack": stack,
        },
        "encoder_local": {
            "node_emb": {"embedding": sd["encoder_local.node_emb.weight"]},
            **{
                f"convs_{i}": {
                    "nn": {
                        "layers_0": dense(f"encoder_local.convs.{i}.nn.layers.0"),
                        "layers_1": dense(f"encoder_local.convs.{i}.nn.layers.1"),
                    }
                }
                for i in range(num_convs_local)
            },
        },
        "grad_global_dist_mlp": mlp3("grad_global_dist_mlp"),
        "grad_local_dist_mlp": mlp3("grad_local_dist_mlp"),
    }
    if ts_mode:
        for side in ("global", "local"):
            params[f"edge_cat_{side}"] = {
                "lin0": dense(f"edge_cat_{side}.0"),
                "lin1": dense(f"edge_cat_{side}.2"),
            }
    return {"params": params}


def convert_reference_checkpoint(pt_path: str, out_path: str | None = None) -> dict:
    """Load a reference ``<iter>.pt`` and emit a tsdiff_tpu checkpoint dict.

    Torch-free: uses :func:`tsdiff_tpu.data.torch_reader.load_torch_file`.
    The embedded EasyDict config is flattened to plain dicts; betas/alphas
    buffers are dropped (recomputed from the config).
    """
    import pickle as _pickle

    from tsdiff_tpu.data.torch_reader import load_torch_file

    ck = load_torch_file(pt_path)

    config = _plain(ck["config"])
    model_cfg = config["model"]
    sd = {
        k: np.asarray(v) for k, v in ck["model"].items()
        if not k.startswith(("betas", "alphas", "sigmas"))
        and not k.endswith(".eps")
    }
    network = model_cfg.get("network", "condensenc")
    if network.startswith("dualenc"):
        params = dualenc_params_from_state_dict(sd, config)
    else:
        params = condensenc_params_from_state_dict(
            sd, num_convs=model_cfg["encoder"]["num_convs"]
        )
    payload = {
        "format": "tsdiff_tpu.ckpt.v1",
        "config": config,
        "params": params,
        "opt_state": None,
        "scheduler": None,
        "iteration": int(ck.get("iteration", 0)),
        "avg_val_loss": ck.get("avg_val_loss"),
    }
    if out_path:
        with open(out_path, "wb") as f:
            _pickle.dump(payload, f, protocol=_pickle.HIGHEST_PROTOCOL)
    return payload


def _plain(obj):
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_plain(v) for v in obj)
    return obj


def convert_reference_dataset(pkl_path: str, out_path: str) -> int:
    """Convert a reference PyG dataset pickle to the tsdiff_tpu format.

    torch_geometric and rdkit are NOT required: absent modules are stubbed
    for unpickling (:mod:`tsdiff_tpu.data.pyg_compat`; torch itself is
    needed for the embedded tensor storages).  Works on dataset pickles and
    on the reference's ``samples_all.pkl`` sampling outputs alike.  Returns
    the number of graphs written.
    """
    from tsdiff_tpu.data.dataset import save_dataset
    from tsdiff_tpu.data.pyg_compat import load_pyg_pickle

    graphs = graphs_from_pyg_list(load_pyg_pickle(pkl_path))
    save_dataset(out_path, graphs)
    return len(graphs)


def graphs_from_pyg_list(data_list) -> list[dict]:
    """PyG ``Data`` objects (real or :mod:`pyg_compat` stubs) -> native
    numpy graph dicts.  Field mapping per reference utils/datasets.py
    (generate_ts_data2 output): atom_type, r_feat/p_feat one-hots, pos,
    condensed edge_index/edge_type; optional positions carried through."""
    from tsdiff_tpu.data.pyg_compat import data_attrs

    graphs = []
    for d in data_list:
        a = data_attrs(d)
        g = dict(
            atom_type=np.asarray(a["atom_type"], dtype=np.int32),
            r_feat=np.asarray(a["r_feat"], dtype=np.float32),
            p_feat=np.asarray(a["p_feat"], dtype=np.float32),
            pos=np.asarray(a["pos"], dtype=np.float32),
            edge_index=np.asarray(a["edge_index"], dtype=np.int32),
            edge_type=np.asarray(a["edge_type"], dtype=np.int32),
            smiles=a.get("smiles"),
        )
        for opt in ("ts_guess", "pos_r", "pos_p", "pos_gen"):
            if opt in a:
                g[opt] = np.asarray(a[opt], dtype=np.float32)
        graphs.append(g)
    return graphs


def main(argv=None):
    """``python -m tsdiff_tpu.data.convert`` — one-shot artifact conversion.

    Subcommands mirror the two artifact kinds a reference user brings
    (module docstring above); note the sampling CLI also accepts reference
    ``.pt`` checkpoints directly (auto-converted on load), so explicit
    conversion is only needed to keep a converted copy on disk.
    """
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    ck = sub.add_parser("ckpt", help="reference <iter>.pt -> tsdiff_tpu .ckpt")
    ck.add_argument("pt_path")
    ck.add_argument("out_path")
    ds = sub.add_parser(
        "dataset", help="reference PyG pickle -> tsdiff_tpu dataset "
        "(torch_geometric/rdkit not needed; torch is)"
    )
    ds.add_argument("pkl_path")
    ds.add_argument("out_path")
    args = ap.parse_args(argv)
    if args.cmd == "ckpt":
        payload = convert_reference_checkpoint(args.pt_path, args.out_path)
        print(
            f"wrote {args.out_path}: iteration {payload['iteration']}, "
            f"network {payload['config']['model'].get('network', 'condensenc')}"
        )
    else:
        n = convert_reference_dataset(args.pkl_path, args.out_path)
        print(f"wrote {args.out_path}: {n} graphs")


if __name__ == "__main__":
    main()
