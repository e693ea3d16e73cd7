import time

import pytest

from percivaltts_tpu.utils.prefetch import prefetch


def test_prefetch_preserves_order_and_items():
    assert list(prefetch(range(100))) == list(range(100))


def test_prefetch_overlaps_producer_and_consumer():
    def slow_producer():
        for i in range(5):
            time.sleep(0.05)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(slow_producer(), depth=2):
        time.sleep(0.05)  # consumer work
    elapsed = time.perf_counter() - t0
    # serial would be ~0.5 s; overlapped ≈ 0.3 s
    assert elapsed < 0.45, elapsed


def test_prefetch_propagates_exceptions():
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(bad())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetch_empty():
    assert list(prefetch([])) == []
