"""Multi-host distributed compression — the axis the reference reserved but
never built (numMPIranks, /root/reference/api/aocl_compression.h:135; RAP
child-thread slots, threads/threads.h:62,122).

Topology: a 2-level mesh ("hosts" x "chips") where the hosts axis rides DCN
(one entry per process) and the chips axis rides ICI. Blocks are the unit of
data parallelism on both axes — the "shard at >= window length" invariant
(threads.c:57) makes every block independent, so the only collectives are:

  - all_gather of per-block compressed sizes/tails (tiny, rides ICI then
    DCN) so every host can lay out the RAP container deterministically;
  - psum of aggregate stats (bytes in/out) for the handle's measure_stats.

Each host feeds its local shard of blocks
(jax.make_array_from_process_local_data) and drains only its local shard of
compressed chunks; host 0 (or any host) assembles the container from the
replicated size table. Single-process use (tests, one dev box) degenerates
to hosts=1 with the same program.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import lz4_device


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Bring up the multi-host runtime (jax.distributed). No-op when the
    runtime is already initialized or everything runs in one process."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_host_chip_mesh(hosts: Optional[int] = None,
                        chips: Optional[int] = None) -> Mesh:
    """Build the ("hosts", "chips") mesh. Defaults: hosts = process count,
    chips = local device count. On a single oversubscribed CPU box the
    requested shape is carved out of the virtual device list (tests)."""
    devs = np.array(jax.devices())
    n_hosts = hosts or jax.process_count()
    n_chips = chips or max(1, len(devs) // n_hosts)
    need = n_hosts * n_chips
    if len(devs) < need:
        raise ValueError(f"need {need} devices for a {n_hosts}x{n_chips} "
                         f"mesh, have {len(devs)}")
    grid = devs[:need].reshape(n_hosts, n_chips)
    return Mesh(grid, ("hosts", "chips"))


@functools.lru_cache(maxsize=8)
def make_distributed_encoder(block_size: int, mesh: Mesh, G: int = 0):
    """Jit the batched encoder with blocks sharded over BOTH mesh axes.

    fn(blocks u8[N, B], lens i32[N]) ->
       (bodies u8[N, OUTCAP] block-sharded,
        sizes/tails i32[N] replicated (all-gathered over ICI+DCN),
        total_in/total_out i32 (psum))
    """
    B = block_size
    fn, _outcap = lz4_device.encoder_block_fn(B, G)

    def local(blocks, lens):
        bodies, sizes, tails, flags = jax.vmap(fn)(blocks, lens)
        total_in = jax.lax.psum(jnp.sum(lens), ("hosts", "chips"))
        total_out = jax.lax.psum(jnp.sum(sizes), ("hosts", "chips"))
        sizes = jax.lax.all_gather(
            jax.lax.all_gather(sizes, "chips", tiled=True),
            "hosts", tiled=True)
        tails = jax.lax.all_gather(
            jax.lax.all_gather(tails, "chips", tiled=True),
            "hosts", tiled=True)
        flags = jax.lax.all_gather(
            jax.lax.all_gather(flags, "chips", tiled=True),
            "hosts", tiled=True)
        return bodies, sizes, tails, flags, total_in, total_out

    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(("hosts", "chips"), None), P(("hosts", "chips"))),
        out_specs=(P(("hosts", "chips"), None), P(), P(), P(), P(), P()),
        check_vma=False)
    return jax.jit(step)


def compress_blocks_distributed(
        blocks_local: Sequence[bytes], block_size: int, mesh: Mesh,
        accel: int = 1) -> Tuple[list, list, int]:
    """Compress this host's local shard of blocks over the global mesh.

    Returns (local bodies, global (sizes, tails) tables, global block
    count). The caller assembles the container from the replicated tables;
    chunk payloads stay with their producing host.
    """
    n_local = len(blocks_local)
    B = block_size
    arr = np.zeros((n_local, B), dtype=np.uint8)
    lens = np.zeros(n_local, dtype=np.int32)
    for i, b in enumerate(blocks_local):
        arr[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)

    spec_blocks = NamedSharding(mesh, P(("hosts", "chips"), None))
    spec_lens = NamedSharding(mesh, P(("hosts", "chips")))
    garr = jax.make_array_from_process_local_data(spec_blocks, arr)
    glens = jax.make_array_from_process_local_data(spec_lens, lens)

    G = lz4_device.grid_for_accel(accel)
    enc = make_distributed_encoder(B, mesh, G)
    bodies, sizes, tails, flags, _ti, _to = jax.block_until_ready(
        enc(garr, glens))

    # drain only the addressable (host-local) shards of the payload
    local_chunks = []
    local_index = []
    sizes_np = np.asarray(sizes)
    tails_np = np.asarray(tails)
    flags_np = np.asarray(flags)
    for shard in bodies.addressable_shards:
        base = shard.index[0].start or 0
        data = np.asarray(shard.data)
        for r in range(data.shape[0]):
            local_chunks.append(data[r, :sizes_np[base + r]].tobytes())
            local_index.append(base + r)
    if flags_np.any():
        # sort-emit overflow blocks: host re-encode (same contract as
        # lz4_device.encode_blocks), fixing the replicated tables too
        from ..codecs.lz4_stitch import final_sequence_len
        from ..runtime import native
        for li, gi in enumerate(local_index):
            if not flags_np[gi]:
                continue
            if li < len(blocks_local):
                stream, t = native.lz4_compress_tail(blocks_local[li],
                                                     max(accel, 1))
                body = stream[:len(stream) - final_sequence_len(t)]
                local_chunks[li] = body
                sizes_np[gi] = len(body)
                tails_np[gi] = t
    return local_chunks, (sizes_np, tails_np), int(garr.shape[0])
