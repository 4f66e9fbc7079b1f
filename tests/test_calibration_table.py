"""Calibration-table freshness guards (VERDICT r3 weak #8 / next #7).

The dispatcher's "never route to a tier measured slower than host"
contract is only as good as the table; these tests catch the stale-entry
failure mode (two entries drifted 2x in round 3) by re-measuring the host
tier live and checking it against the orderings the table encodes.
"""

import time

import pytest

import aocl_compression_tpu as atpu
from aocl_compression_tpu.utils import calibration, dispatch
from aocl_compression_tpu.utils.config import TIER_HOST

atpu.setup("lz4")  # register codecs

ARG = {"lz4": 2, "lz4hc": 9, "zlib": 1, "zstd": 1, "bzip2": 9, "lzma": 6}


def test_table_is_generated_with_provenance():
    src = open(calibration.__file__.replace(".pyc", ".py")).read()
    assert "BEGIN GENERATED TABLE (scripts/recalibrate.py)" in src
    assert "provenance:" in src


def _host_mbps(codec: str, op: str, data: bytes) -> float:
    fn = dispatch._registry[(codec, op)][TIER_HOST][1]
    if op == "compress":
        call = (lambda: fn(data)) if codec == "snappy" \
            else (lambda: fn(data, ARG[codec]))
    else:
        blocks = [data[i:i + 65536] for i in range(0, len(data), 65536)]
        call = (lambda: fn(blocks)) if codec == "snappy" \
            else (lambda: fn(blocks, ARG[codec]))
    call()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        call()
        best = min(best, time.perf_counter() - t0)
    return len(data) / 1e6 / best


@pytest.mark.parametrize("codec,op", [
    (c, o) for (c, o) in sorted(calibration.MEASURED_MBPS)
    if o in ("compress", "compress_blocks")])
def test_host_ordering_not_contradicted(codec, op, corpus):
    """Where the table prefers host over a device tier by a >=2x margin,
    a live host measurement must still beat the table's device number —
    i.e. the routing decision the table encodes survives re-measurement.
    (Sub-2x margins are skipped: those are within box-to-box variance and
    recalibrate.py exists to refresh them.)"""
    tiers = calibration.MEASURED_MBPS[(codec, op)]
    host_tab = tiers.get(TIER_HOST)
    dev = [v for t, v in tiers.items() if t != TIER_HOST]
    if host_tab is None or not dev:
        pytest.skip("no host/device pair in table")
    fastest_dev = max(dev)
    if host_tab < 2.0 * fastest_dev:
        pytest.skip("margin under 2x: box variance territory")
    data = (corpus["text_300k"] * 4)[:1 << 20]
    live = _host_mbps(codec, op, data)
    assert live > fastest_dev, (
        f"{codec}.{op}: live host {live:.1f} MB/s no longer beats the "
        f"table's device {fastest_dev:.1f} — rerun scripts/recalibrate.py")
