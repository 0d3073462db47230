"""Offset-layout symmetric pair packing: exactness vs the dense pair grid."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsdiff_tpu.core.geometry import eq_transform, pairwise_distance
from tsdiff_tpu.core.graph_ops import pair_mask
from tsdiff_tpu.core.packed import (
    eq_transform_packed,
    half_last_slab_mask,
    pack_pairs,
    packed_distance,
    packed_index_arrays,
    packed_valid_mask,
    unpack_pairs,
)


def _sym(rng, b, n, trailing=()):
    x = rng.normal(size=(b, n, n, *trailing)).astype(np.float32)
    return (x + np.swapaxes(x, 1, 2)) / 2


@pytest.mark.parametrize("n", [4, 8, 16, 24])
def test_pack_unpack_roundtrip(n):
    rng = np.random.default_rng(0)
    x = _sym(rng, 2, n)
    x[:, np.arange(n), np.arange(n)] = 0.0
    packed = pack_pairs(jnp.asarray(x))
    assert packed.shape == (2, n // 2, n)
    np.testing.assert_array_equal(np.asarray(unpack_pairs(packed)), x)


def test_every_pair_covered_once_except_last_slab():
    n = 10
    rows, cols = packed_index_arrays(n)
    seen = {}
    for k in range(n // 2):
        for i in range(n):
            key = frozenset((int(rows[k, i]), int(cols[k, i])))
            seen[key] = seen.get(key, 0) + 1
    import math

    assert len(seen) == math.comb(n, 2)
    for key, cnt in seen.items():
        i, j = sorted(key)
        expected = 2 if (j - i) % n == n // 2 else 1
        assert cnt == expected, (key, cnt)


@pytest.mark.parametrize("n", [6, 12, 24])
def test_packed_distance_matches_dense(n):
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.normal(size=(3, n, 3)).astype(np.float32))
    nm = np.ones((3, n), bool)
    nm[1, n - 2 :] = False  # padded atoms
    nm = jnp.asarray(nm)
    d_dense = pairwise_distance(pos, pair_mask(nm))
    pm = packed_valid_mask(nm)
    d_packed = packed_distance(pos, pm)
    np.testing.assert_allclose(
        np.asarray(d_packed), np.asarray(pack_pairs(d_dense)), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(pm), np.asarray(pack_pairs(pair_mask(nm))))


@pytest.mark.parametrize("n", [6, 12, 24])
def test_eq_transform_packed_matches_dense(n):
    """Packed chain rule == dense chain rule for symmetric scores/masks,
    including the 0.5 factor on the duplicated k = N/2 slab."""
    rng = np.random.default_rng(2)
    b = 3
    pos = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    nm = np.ones((b, n), bool)
    nm[2, n - 2 :] = False
    nm = jnp.asarray(nm)

    score = _sym(rng, b, n)
    emask_np = np.asarray(pair_mask(nm)) & (_sym(rng, b, n) > -0.3)
    emask_np = emask_np & np.swapaxes(emask_np, 1, 2)
    emask = jnp.asarray(emask_np)

    d_dense = pairwise_distance(pos, emask)
    dense_out = eq_transform(jnp.asarray(score), pos, emask, d_dense)

    m_eq = pack_pairs(emask).astype(jnp.float32) * half_last_slab_mask(n)
    packed_out = eq_transform_packed(
        pack_pairs(jnp.asarray(score)), pos, m_eq, pack_pairs(d_dense)
    )
    np.testing.assert_allclose(
        np.asarray(packed_out), np.asarray(dense_out), rtol=2e-5, atol=1e-5
    )
