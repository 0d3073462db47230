"""The parity drill (tools/parity_drill.py) at tiny size, in the suite.

The drill rehearses the real-artifact path: flax params -> reference torch
checkpoint (real torch) -> torch-free conversion -> sampling CLI -> bit-exact
score diff.  The production-size version is a per-round manual run
(documented in DEMO.md)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

torch = pytest.importorskip("torch")


def test_parity_drill_tiny(tmp_path):
    from parity_drill import run_drill

    res = run_drill(size="tiny", n_steps=10, scratch=str(tmp_path), batch_size=2)
    assert res["bit_exact_roundtrip"] is True
    assert res["score_diff"] == 0.0
    assert res["sampled"] == 2
