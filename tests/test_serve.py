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
        assert set(svc._runners) == {(8, 0), (16, 0)}
        assert svc._served == 4
    finally:
        svc.close()


def test_service_draft_quality_tier(tiny_ckpt):
    """Draft (respaced) and full requests batch separately, run different
    compiled programs, and both resolve; draft without a configured tier is
    rejected."""
    rng = np.random.default_rng(3)
    graphs = make_graph_dicts(rng, [5, 6, 7, 6], feat_dim=FEAT)
    svc = SamplerService(
        [tiny_ckpt], n_steps=8, dtype="float32", max_batch=4,
        max_wait_s=0.2, draft_respacing=2,
    )
    try:
        futs = [
            svc.submit(graphs[0], quality="full"),
            svc.submit(graphs[1], quality="draft"),
            svc.submit(graphs[2], quality="draft"),
            svc.submit(graphs[3], quality="full"),
        ]
        for g, f in zip(graphs, futs):
            r = f.result(timeout=120)
            assert r["pos_gen"].shape == (len(g["atom_type"]), 3)
            assert np.isfinite(r["pos_gen"]).all()
        # one full program and one 2-step draft program, same N=8 bucket
        assert set(svc._runners) == {(8, 0), (8, 2)}
    finally:
        svc.close()

    svc2 = SamplerService([tiny_ckpt], n_steps=8, dtype="float32", max_batch=4)
    try:
        with pytest.raises(ValueError, match="no draft tier"):
            svc2.submit(graphs[0], quality="draft")
        with pytest.raises(ValueError, match="quality must be"):
            svc2.submit(graphs[0], quality="fast")
    finally:
        svc2.close()
    with pytest.raises(ValueError, match="draft_respacing"):
        SamplerService([tiny_ckpt], n_steps=8, dtype="float32",
                       draft_respacing=9)


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


# -- round-3 hardening: tier planning, backpressure, timeout, cancel, drain --


def _planner(max_batch, dp=1):
    svc = SamplerService.__new__(SamplerService)
    svc.max_batch = max_batch
    svc._dp = dp
    return svc


def test_tier_ladder_and_planning():
    p = _planner(100)
    assert p._tier_ladder() == [100, 50, 25, 12, 6]
    # the round-2 waste case: 54 requests no longer pad to tier 100
    assert p._plan_tiers(54) == [50, 6]
    assert sum(p._plan_tiers(54)) < 100
    # tiny remainders are not worth an extra dispatch
    assert p._plan_tiers(5) == [6]
    assert p._plan_tiers(0) == []
    assert p._plan_tiers(100) == [100]
    for n in range(1, 101):
        plan = p._plan_tiers(n)
        assert sum(plan) >= n
        assert all(t in p._tier_ladder() for t in plan)


def test_tier_ladder_respects_dp():
    # ADVICE round-2: max_batch=18, dp=6 must not yield tier 9
    p = _planner(18, dp=6)
    assert p._tier_ladder() == [18]
    assert p._batch_tier(4) == 18
    p2 = _planner(32, dp=8)
    assert p2._tier_ladder() == [32, 16, 8]
    assert all(t % 8 == 0 for t in p2._plan_tiers(21))


@pytest.fixture
def gated_service(tiny_ckpt, monkeypatch):
    """Service whose _run_group blocks on an event — deterministic queue
    states without device timing."""
    import time as _time

    gate = threading.Event()
    ran = []

    def fake_run_group(self, bucket, group, tier, respacing=0):
        assert gate.wait(60), "test gate never opened"
        for r in group:
            if not r.future.done():
                r.future.set_result(
                    {"pos_gen": np.zeros((r.n_atoms, 3), np.float32), "nan": False}
                )
        self._served += len(group)
        ran.append((bucket, tier, len(group)))

    monkeypatch.setattr(SamplerService, "_run_group", fake_run_group)
    svc = SamplerService(
        [tiny_ckpt], n_steps=2, dtype="float32", max_batch=2,
        max_wait_s=0.05, max_pending=2,
    )
    # hand the worker its first request so the queue is exclusively ours
    first = svc.submit(make_graph_dicts(np.random.default_rng(9), [5], feat_dim=FEAT)[0])
    for _ in range(200):
        if svc._q.qsize() == 0 and first.running():
            break
        _time.sleep(0.02)
    assert first.running(), "worker did not pick up the priming request"
    yield svc, gate, ran, first
    gate.set()
    svc.close()


def test_backpressure_rejects_when_full(gated_service):
    from tsdiff_tpu.serve import ServiceOverloaded

    svc, gate, _, first = gated_service
    rng = np.random.default_rng(10)
    gs = make_graph_dicts(rng, [5, 5, 5], feat_dim=FEAT)
    f1 = svc.submit(gs[0])
    f2 = svc.submit(gs[1])
    with pytest.raises(ServiceOverloaded):
        svc.submit(gs[2])
    assert svc._rejected == 1
    gate.set()
    assert f1.result(timeout=60)["pos_gen"].shape == (5, 3)
    assert f2.result(timeout=60)["nan"] is False
    assert first.result(timeout=60) is not None


def test_submit_validates_feat_width(tiny_ckpt):
    """A malformed request fails ITS OWN submit call (in multi-process
    serving it would otherwise desync the broadcast against the workers'
    model-config-derived placeholders and wedge the cluster)."""
    svc = SamplerService([tiny_ckpt], n_steps=4, dtype="float32", max_batch=4)
    try:
        rng = np.random.default_rng(0)
        bad = make_graph_dicts(rng, [5], feat_dim=FEAT + 3)[0]
        with pytest.raises(ValueError, match="feat_dim"):
            svc.submit(bad)
        # a well-formed request still serves afterwards
        ok = make_graph_dicts(rng, [5], feat_dim=FEAT)[0]
        assert svc.submit(ok).result(timeout=120)["pos_gen"].shape == (5, 3)
    finally:
        svc.close(drain=False)


def test_timeout_and_cancel(gated_service):
    import time as _time

    svc, gate, ran, first = gated_service
    rng = np.random.default_rng(11)
    gs = make_graph_dicts(rng, [6, 6], feat_dim=FEAT)
    f_timeout = svc.submit(gs[0], timeout_s=0.01)
    f_cancel = svc.submit(gs[1])
    assert f_cancel.cancel()
    _time.sleep(0.05)  # let the deadline expire while queued
    gate.set()
    with pytest.raises(TimeoutError):
        f_timeout.result(timeout=60)
    assert f_cancel.cancelled()
    first.result(timeout=60)
    # wait for the worker to process the shed batch
    for _ in range(200):
        if svc._timed_out and svc._cancelled:
            break
        _time.sleep(0.02)
    assert svc._timed_out == 1 and svc._cancelled == 1
    # neither shed request occupied a batch slot
    assert all(n <= 1 for _, _, n in ran)


def test_worker_survives_cancelled_expired_request(gated_service):
    """A request that is BOTH client-cancelled and deadline-expired must not
    kill the worker (set_exception on a cancelled future raises
    InvalidStateError); later requests are still served."""
    import time as _time

    svc, gate, _, first = gated_service
    rng = np.random.default_rng(12)
    gs = make_graph_dicts(rng, [6, 6], feat_dim=FEAT)
    f_both = svc.submit(gs[0], timeout_s=0.01)
    assert f_both.cancel()
    _time.sleep(0.05)  # deadline expires while the request is still queued
    gate.set()
    first.result(timeout=60)
    assert f_both.cancelled()
    # the worker thread is still alive and serving
    f_after = svc.submit(gs[1])
    assert f_after.result(timeout=60)["pos_gen"].shape == (6, 3)
    assert svc._worker.is_alive()


def test_close_drains_queued_requests(tiny_ckpt, monkeypatch):
    ran = []

    def fake_run_group(self, bucket, group, tier, respacing=0):
        for r in group:
            if not r.future.done():
                r.future.set_result(
                    {"pos_gen": np.zeros((r.n_atoms, 3), np.float32), "nan": False}
                )
        ran.append(len(group))

    monkeypatch.setattr(SamplerService, "_run_group", fake_run_group)
    svc = SamplerService(
        [tiny_ckpt], n_steps=2, dtype="float32", max_batch=4, max_wait_s=0.01,
    )
    futs = [
        svc.submit(g)
        for g in make_graph_dicts(np.random.default_rng(12), [5] * 6, feat_dim=FEAT)
    ]
    svc.close(drain=True)
    assert all(f.result(timeout=1)["nan"] is False for f in futs)
    with pytest.raises(RuntimeError):
        svc.submit(make_graph_dicts(np.random.default_rng(1), [5], feat_dim=FEAT)[0])
