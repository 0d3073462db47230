"""Torch-free .pt reader: parse real torch-serialized checkpoints with stdlib only.

The reader itself (tsdiff_tpu/data/torch_reader.py) never imports torch; the
tests use torch (available in this environment) to WRITE fixtures in the
exact on-disk format of reference checkpoints (reference train.py:220-231)
and assert our stdlib parse reproduces every tensor bit-exactly.
"""

import collections

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")

from tsdiff_tpu.data.convert import convert_reference_checkpoint
from tsdiff_tpu.data.torch_reader import load_torch_file

from test_condensenc import MODEL_CFG, make_batch
from test_convert import params_to_state_dict

# reference configs are easydict.EasyDict; stand-in with the same pickle GLOBAL
# (registered as a real module so the pickler's import check passes)
import sys
import types

FakeEasyDict = type("EasyDict", (dict,), {"__module__": "easydict"})
if "easydict" not in sys.modules:
    _m = types.ModuleType("easydict")
    _m.EasyDict = FakeEasyDict
    sys.modules["easydict"] = _m


def test_load_torch_file_tensors_roundtrip(tmp_path):
    path = str(tmp_path / "ck.pt")
    g = torch.Generator().manual_seed(0)
    obj = {
        "f32": torch.randn(3, 5, generator=g),
        "f64": torch.randn(4, generator=g, dtype=torch.float64),
        "i64": torch.arange(7),
        "i32": torch.arange(6, dtype=torch.int32).reshape(2, 3),
        "u8": torch.arange(4, dtype=torch.uint8),
        "bool": torch.tensor([True, False, True]),
        "bf16": torch.randn(5, generator=g).to(torch.bfloat16),
        "noncontig": torch.randn(4, 6, generator=g).t(),  # stride exercise
        "scalar": 3,
        "nested": collections.OrderedDict(x=torch.zeros(2, 2)),
    }
    torch.save(obj, path)
    out = load_torch_file(path)

    for k in ("f32", "f64", "i64", "i32", "u8", "bool", "noncontig"):
        np.testing.assert_array_equal(out[k], obj[k].numpy(), err_msg=k)
    np.testing.assert_array_equal(out["bf16"], obj["bf16"].float().numpy())
    assert out["scalar"] == 3
    np.testing.assert_array_equal(out["nested"]["x"], np.zeros((2, 2)))


def test_load_torch_file_shared_storage_views(tmp_path):
    # two tensors viewing one storage at different offsets (common in fused params)
    path = str(tmp_path / "views.pt")
    base = torch.arange(12, dtype=torch.float32)
    torch.save({"a": base[2:8], "b": base.reshape(3, 4)}, path)
    out = load_torch_file(path)
    np.testing.assert_array_equal(out["a"], np.arange(2, 8, dtype=np.float32))
    np.testing.assert_array_equal(
        out["b"], np.arange(12, dtype=np.float32).reshape(3, 4)
    )


def test_load_torch_file_unknown_globals_are_inert(tmp_path):
    # optimizer/scheduler states unpickle to placeholders, never executing code
    path = str(tmp_path / "opt.pt")
    lin = torch.nn.Linear(3, 3)
    opt = torch.optim.Adam(lin.parameters())
    opt.step()  # no grads — just materialize state structure
    torch.save({"optimizer": opt.state_dict(), "w": lin.weight.detach()}, path)
    out = load_torch_file(path)
    np.testing.assert_array_equal(out["w"], lin.weight.detach().numpy())
    assert "optimizer" in out


def test_convert_reference_checkpoint_without_torch_loader(tmp_path):
    """Full path: torch-format reference checkpoint -> tsdiff_tpu params ->
    identical forward (reference checkpoint layout, train.py:220-231)."""
    rng = np.random.default_rng(0)
    batch = make_batch(rng, [5, 8])
    from tsdiff_tpu.models import get_model

    model = get_model(MODEL_CFG)
    params = model.init(
        jax.random.key(0),
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    L = MODEL_CFG.encoder.num_convs
    sd = collections.OrderedDict(
        (k, torch.from_numpy(np.ascontiguousarray(v)))
        for k, v in params_to_state_dict(params, L).items()
    )
    config = FakeEasyDict(
        model=FakeEasyDict({**{k: v for k, v in MODEL_CFG.items() if k != "encoder"},
                            "encoder": FakeEasyDict(dict(MODEL_CFG.encoder))})
    )
    pt = str(tmp_path / "400000.pt")
    torch.save(
        {"config": config, "model": sd, "iteration": 400000, "avg_val_loss": 0.25},
        pt,
    )

    ck = convert_reference_checkpoint(pt, out_path=str(tmp_path / "out.pkl"))
    assert ck["iteration"] == 400000
    out1, _, _ = model.apply(
        params, batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    out2, _, _ = model.apply(
        ck["params"], batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)
