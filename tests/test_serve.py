"""Batching inference service: futures API, bucket batching, HTTP front end."""

import json
import pickle
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsdiff_tpu.config import Config
from tsdiff_tpu.serve import SamplerService
from tsdiff_tpu.train import save_checkpoint
from tsdiff_tpu.train.trainer import TrainState

from test_condensenc import MODEL_CFG, make_batch
from test_data import make_graph_dicts

FEAT = MODEL_CFG.feat_dim


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from tsdiff_tpu.models import get_model

    root = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(0)
    batch = make_batch(rng, [5, 6], n_pad=8)
    model = get_model(MODEL_CFG)
    params = model.init(
        jax.random.key(0), batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    p = str(root / "0.ckpt")
    save_checkpoint(
        p, Config(model=MODEL_CFG.to_dict()),
        TrainState(params=params, opt_state=None, step=jnp.asarray(0)),
    )
    return p


def test_service_batches_and_resolves(tiny_ckpt):
    rng = np.random.default_rng(1)
    graphs = make_graph_dicts(rng, [5, 7, 6, 12], feat_dim=FEAT)
    svc = SamplerService(
        [tiny_ckpt, tiny_ckpt], n_steps=4, dtype="float32", max_batch=4,
        max_wait_s=0.2,
    )
    try:
        results = svc.generate(graphs)
        assert len(results) == 4
        for g, r in zip(graphs, results):
            n = len(g["atom_type"])
            assert r["pos_gen"].shape == (n, 3)
            assert np.isfinite(r["pos_gen"]).all()
            assert r["nan"] is False
        # sizes 5/7/6 share the N=8 bucket; 12 lands in N=16 -> 2 compilations
        assert set(svc._runners) == {8, 16}
        assert svc._served == 4
    finally:
        svc.close()


def test_http_front_end(tiny_ckpt):
    import tsdiff_tpu.serve as serve_mod

    import socket

    rng = np.random.default_rng(2)
    g = make_graph_dicts(rng, [6], feat_dim=FEAT)[0]
    with socket.socket() as sk:  # grab a free port
        sk.bind(("127.0.0.1", 0))
        port = sk.getsockname()[1]
    t = threading.Thread(
        target=serve_mod.main,
        args=([tiny_ckpt, "--port", str(port), "--n_steps", "3",
               "--dtype", "float32", "--max_batch", "2", "--max_wait_ms", "20"],),
        daemon=True,
    )
    t.start()

    def wait_healthy():
        for _ in range(100):
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=1
                ) as r:
                    return json.load(r)
            except Exception:
                import time

                time.sleep(0.2)
        raise RuntimeError("server did not come up")

    assert wait_healthy()["ok"] is True

    payload = json.dumps({
        "graphs": [{
            "atom_type": np.asarray(g["atom_type"]).tolist(),
            "r_feat": np.asarray(g["r_feat"]).tolist(),
            "p_feat": np.asarray(g["p_feat"]).tolist(),
            "pos": None,
            "edge_index": np.asarray(g["edge_index"]).tolist(),
            "edge_type": np.asarray(g["edge_type"]).tolist(),
        }]
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate", data=payload,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.load(r)
    pos = np.asarray(out["pos_gen"][0])
    assert pos.shape == (6, 3) and np.isfinite(pos).all()
    assert out["nan"] == [False]
    # malformed request -> 400 with an error body, server stays up
    bad = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate", data=b"{}",
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(bad, timeout=30)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.load(e)
    assert wait_healthy()["served"] >= 1


def test_service_sharded_matches_unsharded(tiny_ckpt):
    """Mesh-backed service returns the same samples as single-device."""
    from tsdiff_tpu.parallel import make_mesh

    rng = np.random.default_rng(3)
    graphs = make_graph_dicts(rng, [5, 7, 6, 8], feat_dim=FEAT)

    def run(mesh):
        svc = SamplerService(
            [tiny_ckpt, tiny_ckpt], n_steps=4, dtype="float32",
            max_batch=4, max_wait_s=0.2, mesh=mesh,
        )
        try:
            return svc.generate(graphs)
        finally:
            svc.close()

    ref = run(None)
    out = run(make_mesh(dp=4, ens=2))
    for a, b in zip(ref, out):
        np.testing.assert_allclose(b["pos_gen"], a["pos_gen"], rtol=1e-4, atol=1e-5)
