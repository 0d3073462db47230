"""Reference checkpoint conversion: state_dict -> flax params roundtrip."""

import numpy as np
import jax

from tsdiff_tpu.data.convert import condensenc_params_from_state_dict
from tsdiff_tpu.models import get_model

from test_condensenc import MODEL_CFG, make_batch


from tsdiff_tpu.data.convert import condensenc_state_dict_from_params

# back-compat alias: the inverse mapping moved into data/convert.py so the
# parity drill (tools/parity_drill.py) can synthesize reference checkpoints
params_to_state_dict = condensenc_state_dict_from_params


def test_state_dict_roundtrip_preserves_forward():
    rng = np.random.default_rng(0)
    batch = make_batch(rng, [5, 8])
    model = get_model(MODEL_CFG)
    params = model.init(
        jax.random.key(0),
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    L = MODEL_CFG.encoder.num_convs
    sd = params_to_state_dict(params, L)
    params2 = condensenc_params_from_state_dict(sd, L)

    # tree equality
    leaves1 = jax.tree_util.tree_leaves_with_path(params)
    leaves2 = dict(jax.tree_util.tree_leaves_with_path(params2))
    for path, a in leaves1:
        b = leaves2[path]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))

    out1, _, _ = model.apply(
        params, batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    out2, _, _ = model.apply(
        params2, batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


# --------------------------------------------------------------------------
# DualEncoderEpsNetwork conversion
# --------------------------------------------------------------------------


def dual_params_to_state_dict(params: dict, num_convs: int, num_convs_local: int,
                              ts_mode: bool) -> dict:
    """Inverse mapping (test-only): dualenc flax params -> torch-style
    state_dict with the reference's module names (dualenc.py:60-200)."""
    p = params["params"]
    sd = {}

    def put_dense(prefix, d):
        sd[f"{prefix}.weight"] = np.asarray(d["Dense_0"]["kernel"]).T
        if "bias" in d["Dense_0"]:
            sd[f"{prefix}.bias"] = np.asarray(d["Dense_0"]["bias"])

    for side in ("global", "local"):
        ee = p[f"edge_encoder_{side}"]
        sd[f"edge_encoder_{side}.bond_emb.weight"] = np.asarray(ee["bond_emb"]["embedding"])
        put_dense(f"edge_encoder_{side}.mlp.layers.0", ee["mlp"]["layers_0"])
        put_dense(f"edge_encoder_{side}.mlp.layers.1", ee["mlp"]["layers_1"])
        if ts_mode:
            put_dense(f"edge_cat_{side}.0", p[f"edge_cat_{side}"]["lin0"])
            put_dense(f"edge_cat_{side}.2", p[f"edge_cat_{side}"]["lin1"])
        for i in range(3):
            put_dense(f"grad_{side}_dist_mlp.layers.{i}",
                      p[f"grad_{side}_dist_mlp"][f"layers_{i}"])

    sd["encoder_global.node_emb.weight"] = np.asarray(p["encoder_global"]["node_emb"]["embedding"])
    st = p["encoder_global"]["stack"]
    for l in range(num_convs):
        sd[f"encoder_global.interactions.{l}.conv.mlp.0.weight"] = np.asarray(st["f1w"][l]).T
        sd[f"encoder_global.interactions.{l}.conv.mlp.0.bias"] = np.asarray(st["f1b"][l])
        sd[f"encoder_global.interactions.{l}.conv.mlp.2.weight"] = np.asarray(st["f2w"][l]).T
        sd[f"encoder_global.interactions.{l}.conv.mlp.2.bias"] = np.asarray(st["f2b"][l])
        sd[f"encoder_global.interactions.{l}.conv.lin1.weight"] = np.asarray(st["l1w"][l]).T
        sd[f"encoder_global.interactions.{l}.conv.lin2.weight"] = np.asarray(st["l2w"][l]).T
        sd[f"encoder_global.interactions.{l}.conv.lin2.bias"] = np.asarray(st["l2b"][l])
        sd[f"encoder_global.interactions.{l}.lin.weight"] = np.asarray(st["ow"][l]).T
        sd[f"encoder_global.interactions.{l}.lin.bias"] = np.asarray(st["ob"][l])

    sd["encoder_local.node_emb.weight"] = np.asarray(p["encoder_local"]["node_emb"]["embedding"])
    for i in range(num_convs_local):
        c = p["encoder_local"][f"convs_{i}"]["nn"]
        put_dense(f"encoder_local.convs.{i}.nn.layers.0", c["layers_0"])
        put_dense(f"encoder_local.convs.{i}.nn.layers.1", c["layers_1"])
    return sd


def test_dualenc_state_dict_roundtrip():
    from tsdiff_tpu.data.convert import dualenc_params_from_state_dict
    from test_dualenc import CFG_DIFF_TS, make_legacy_batch

    rng = np.random.default_rng(1)
    batch = make_legacy_batch(rng, [5, 6], ts=True)
    model = get_model(CFG_DIFF_TS)
    params = model.init(
        jax.random.key(0), batch.atom_type, batch.pos, batch.bond_mat,
        batch.node_mask,
    )
    cfg = {"model": dict(CFG_DIFF_TS.to_dict())}
    sd = dual_params_to_state_dict(
        params, CFG_DIFF_TS.num_convs, CFG_DIFF_TS.num_convs_local, ts_mode=True
    )
    params2 = dualenc_params_from_state_dict(sd, cfg)

    flat1 = jax.tree_util.tree_flatten_with_path(params)
    flat2 = jax.tree_util.tree_flatten_with_path(params2)
    assert [k for k, _ in flat1[0]] == [k for k, _ in flat2[0]]
    for (k, a), (_, b) in zip(flat1[0], flat2[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))

    # forward with converted params == forward with originals
    out1 = model.apply(params, batch.atom_type, batch.pos, batch.bond_mat, batch.node_mask)
    out2 = model.apply(params2, batch.atom_type, batch.pos, batch.bond_mat, batch.node_mask)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))


def test_load_checkpoint_accepts_reference_pt(tmp_path):
    """load_checkpoint auto-converts a reference torch .pt (zip container),
    so the reference README's sampling command works on original artifacts
    (reference train.py:220-231 checkpoint format)."""
    import pytest

    torch = pytest.importorskip("torch")
    import collections

    from tsdiff_tpu.train.trainer import load_checkpoint

    rng = np.random.default_rng(3)
    batch = make_batch(rng, [5, 8])
    model = get_model(MODEL_CFG)
    params = model.init(
        jax.random.key(0), batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    L = MODEL_CFG.encoder.num_convs
    sd = collections.OrderedDict(
        (k, torch.from_numpy(np.ascontiguousarray(v)))
        for k, v in condensenc_state_dict_from_params(params, L).items()
    )
    pt = tmp_path / "3000.pt"
    torch.save(
        {"config": {"model": MODEL_CFG.to_dict()}, "model": sd,
         "iteration": 3000, "avg_val_loss": 0.5},
        str(pt),
    )

    ck = load_checkpoint(str(pt))
    assert ck["format"] == "tsdiff_tpu.ckpt.v1"
    assert ck["iteration"] == 3000
    conv = dict(jax.tree_util.tree_leaves_with_path(ck["params"]))
    for path, a in jax.tree_util.tree_leaves_with_path(params):
        np.testing.assert_array_equal(np.asarray(a), conv[path], err_msg=str(path))

    # the module CLI writes an equivalent checkpoint to disk
    from tsdiff_tpu.data.convert import main as convert_main

    out = tmp_path / "converted.ckpt"
    convert_main(["ckpt", str(pt), str(out)])
    ck2 = load_checkpoint(str(out))
    assert ck2["iteration"] == 3000
