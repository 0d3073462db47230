"""Prefetcher: ordering, transfer application, error propagation."""

import pytest

from tsdiff_tpu.data.prefetch import Prefetcher


def test_order_and_transfer():
    out = list(Prefetcher(range(10), depth=3, transfer=lambda x: x * 2))
    assert out == [x * 2 for x in range(10)]


def test_worker_errors_surface():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = iter(Prefetcher(gen(), depth=2))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_infinite_iterable_laziness():
    def counter():
        i = 0
        while True:
            yield i
            i += 1

    it = iter(Prefetcher(counter(), depth=2))
    assert [next(it) for _ in range(5)] == [0, 1, 2, 3, 4]
