"""Fast single-process unit tests for parallel/multihost.py helpers.

The cluster-level behavior lives in tests/test_multihost.py (heavy: real
2-process runs); these cover the host-side contract pieces that don't need
a second process."""

import jax
import numpy as np
import pytest

from tsdiff_tpu.parallel import make_mesh
from tsdiff_tpu.parallel.multihost import (
    global_from_full,
    global_key,
    initialize,
    make_global_batch,
    replicate_output,
)
from tsdiff_tpu.parallel.sharding import batch_spec, replicated_spec


def test_initialize_rejects_partial_flags():
    with pytest.raises(ValueError, match="coordinator"):
        initialize(None, num_processes=2, process_id=0)
    with pytest.raises(ValueError, match="coordinator"):
        initialize(None, num_processes=None, process_id=1)


def test_make_global_batch_shards_data_axes():
    """Batch pytrees place over the mesh's data axes — flat (dp) AND hybrid
    (dp_dcn, dp) — with values preserved."""
    from tsdiff_tpu.parallel import make_hybrid_mesh

    tree = {
        "a": np.arange(8 * 5, dtype=np.float32).reshape(8, 5),
        "b": np.arange(8, dtype=np.int32),
    }
    for mesh in (make_mesh(dp=8, ens=1), make_hybrid_mesh(ens=1, num_slices=2)):
        g = make_global_batch(tree, mesh)
        np.testing.assert_array_equal(np.asarray(g["a"]), tree["a"])
        np.testing.assert_array_equal(np.asarray(g["b"]), tree["b"])
        assert not g["a"].sharding.is_fully_replicated  # leading axis sharded


def test_global_from_full_single_process_values():
    """make_array_from_callback placement must reproduce the host values for
    sharded AND replicated specs (single-process degenerate case — the
    cross-process case is covered by the cluster tests)."""
    mesh = make_mesh(dp=8, ens=1)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    g = global_from_full(x, batch_spec(mesh))
    assert g.sharding.spec == batch_spec(mesh).spec
    np.testing.assert_array_equal(np.asarray(g), x)
    r = global_from_full({"a": x, "b": x[0]}, replicated_spec(mesh))
    np.testing.assert_array_equal(np.asarray(r["a"]), x)
    np.testing.assert_array_equal(np.asarray(r["b"]), x[0])


def test_global_key_usable_and_deterministic():
    mesh = make_mesh(dp=8, ens=1)
    k1 = global_key(jax.random.key(7), mesh)
    k2 = global_key(jax.random.key(7), mesh)
    a = jax.random.normal(k1, (4,))
    b = jax.random.normal(k2, (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # matches the plain local key's stream
    c = jax.random.normal(jax.random.key(7), (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # splits of a global key keep working (the train loop relies on this)
    k3, k4 = jax.random.split(k1)
    assert jax.random.normal(k4, ()).shape == ()


def test_replicate_output_gathers_and_caches():
    from tsdiff_tpu.parallel import multihost as mh

    mesh = make_mesh(dp=8, ens=1)
    x = np.arange(8 * 2, dtype=np.float32).reshape(8, 2)
    sharded = global_from_full(x, batch_spec(mesh))
    out = replicate_output(sharded, mesh)
    assert out.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(out), x)
    # the jitted identity is cached per mesh, not rebuilt per call
    assert mh._replicator(mesh) is mh._replicator(mesh)
