"""Distributed (hosts x chips mesh) tests on the virtual 8-device CPU mesh.

Validates the net-new multi-host axis (SURVEY §2.3): 2-level mesh
construction, shard_map encode with nested all_gathers + psum, process-local
payload drain, and container assembly from the replicated size table."""

import numpy as np
import pytest

from aocl_compression_tpu.parallel import distributed
from aocl_compression_tpu.runtime import native
from aocl_compression_tpu.codecs import lz4_stitch


def _blocks(n, b, seed=0):
    import random
    rng = random.Random(seed)
    words = [b"hash ", b"match ", b"the ", b"block ", b"stream "]
    out = []
    for _ in range(n):
        buf = bytearray()
        while len(buf) < b:
            buf += rng.choice(words)
        out.append(bytes(buf[:b]))
    return out


@pytest.mark.parametrize("hosts,chips", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_mesh_shapes(hosts, chips):
    mesh = distributed.make_host_chip_mesh(hosts, chips)
    assert mesh.axis_names == ("hosts", "chips")
    assert mesh.devices.shape == (hosts, chips)


def test_distributed_encode_roundtrips():
    B = 1024
    blocks = _blocks(16, B)
    mesh = distributed.make_host_chip_mesh(2, 4)
    chunks, (sizes, tails), n = distributed.compress_blocks_distributed(
        blocks, B, mesh, accel=2)
    assert n == 16 and len(chunks) == 16  # single process: all addressable
    # stitch into a serial stream and verify with the host oracle
    bodies = chunks
    tails_l = [int(t) for t in tails]
    regions, dlens = lz4_stitch.stitch_bodies(bodies, tails_l, blocks)
    total = b"".join(blocks)
    assert native.lz4_decompress(b"".join(regions), len(total)) == total


def test_distributed_matches_single_device():
    """The mesh program must produce the same chunks as the plain batch."""
    from aocl_compression_tpu.ops import lz4_device
    B = 1024
    blocks = _blocks(8, B, seed=3)
    mesh = distributed.make_host_chip_mesh(2, 4)
    chunks, (sizes, _), _ = distributed.compress_blocks_distributed(
        blocks, B, mesh, accel=2)
    bodies, _tails = lz4_device.encode_blocks(blocks, accel=2)
    assert chunks == bodies


def test_mesh_oversubscription_error():
    with pytest.raises(ValueError):
        distributed.make_host_chip_mesh(16, 4)
