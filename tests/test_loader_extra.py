"""Loader corner cases and config round-trips."""

import numpy as np
import pytest
import yaml

from tsdiff_tpu.config import Config, load_config
from tsdiff_tpu.data import PaddedBatchLoader, TSDataset

from test_data import make_graph_dicts


def test_drop_tail_and_explicit_buckets():
    rng = np.random.default_rng(0)
    ds = TSDataset(make_graph_dicts(rng, [5, 5, 5, 9, 9]))
    loader = PaddedBatchLoader(
        ds, batch_size=2, shuffle=False, bucket_sizes=[8, 16], drop_tail=True
    )
    batches = list(loader)
    # bucket 8 has 3 graphs -> 1 full batch (tail dropped); bucket 16 has 2 -> 1
    assert len(batches) == 2
    for b in batches:
        assert b.atom_type.shape[0] == 2


def test_oversized_graph_raises():
    rng = np.random.default_rng(1)
    ds = TSDataset(make_graph_dicts(rng, [20]))
    loader = PaddedBatchLoader(ds, batch_size=1, bucket_sizes=[8, 16])
    with pytest.raises(ValueError):
        list(loader)


def test_batch_dtypes():
    rng = np.random.default_rng(2)
    ds = TSDataset(make_graph_dicts(rng, [5, 6]))
    batch = next(iter(PaddedBatchLoader(ds, batch_size=2)))
    assert batch.r_feat.dtype == np.uint8
    assert batch.p_feat.dtype == np.uint8
    assert str(batch.pos.dtype) == "float32"
    assert str(batch.bond_mat.dtype) == "int32"
    assert batch.node_mask.dtype == bool


def test_config_roundtrip(tmp_path):
    cfg = Config(a=1, nested=dict(x=[1, 2], y="z"))
    p = tmp_path / "c.yml"
    p.write_text(cfg.to_yaml())
    back = load_config(str(p))
    assert back.a == 1 and back.nested.x == [1, 2] and back.nested.y == "z"
    assert back.get("missing", 7) == 7
    # nested dicts are dot-accessible after assignment too
    back.new = {"deep": {"val": 3}}
    assert back.new.deep.val == 3
