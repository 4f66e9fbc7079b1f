"""Sharded block-parallel compression over a TPU device mesh.

This is the distributed axis the reference only stubbed (numMPIranks reserved,
/root/reference/api/aocl_compression.h:135) plus the TPU-native replacement
for its OpenMP SMP runtime (SURVEY.md §2.3): blocks are the unit of data
parallelism, sharded over a 1-D mesh; per-block compressed sizes are
all-gathered so every host can assemble the RAP container deterministically.

Design:
  - mesh axis "blocks": embarrassingly parallel encode/decode (fresh history
    per block — the "shard at >= window length" invariant).
  - collectives ride ICI: `all_gather` of per-block sizes + tails (tiny), and
    the compressed payload stays device-resident until the host drains it.
  - multi-host: the same program under jax.distributed with a global mesh;
    each host feeds its local shard of blocks (process-local data path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import lz4_device


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "blocks") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            # single-chip dev box: validate the n-way sharding on the
            # virtual CPU mesh (xla_force_host_platform_device_count)
            devs = jax.devices("cpu")
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)}; set "
                "XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} to dry-run the sharding on CPU")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


@functools.lru_cache(maxsize=8)
def make_sharded_encoder(block_size: int, mesh: Mesh,
                         axis_name: str = "blocks", G: int = 0):
    """Jit the batched LZ4 encoder with the block axis sharded over the mesh.

    Returns fn(blocks u8[N, B], lens i32[N]) ->
      (bodies u8[N, OUTCAP] sharded, sizes i32[N] replicated,
       tails i32[N] replicated).
    Sizes/tails are all-gathered (replicated out-sharding -> XLA inserts the
    ICI all-gather) because container assembly needs every block's size.
    """
    B = block_size
    fn, _outcap = lz4_device.encoder_block_fn(B, G)

    shard = NamedSharding(mesh, P(axis_name))
    shard2 = NamedSharding(mesh, P(axis_name, None))
    repl = NamedSharding(mesh, P())

    def step(blocks, lens):
        return jax.vmap(fn)(blocks, lens)

    return jax.jit(step,
                   in_shardings=(shard2, shard),
                   out_shardings=(shard2, repl, repl, repl))


@functools.lru_cache(maxsize=8)
def make_sharded_decoder(chunk_cap: int, block_size: int, mesh: Mesh,
                         axis_name: str = "blocks"):
    """Jit the batched LZ4 decoder sharded over the block axis."""
    C, B = chunk_cap, block_size
    MAXTOK = C // 3 + 2
    shard = NamedSharding(mesh, P(axis_name))
    shard2 = NamedSharding(mesh, P(axis_name, None))

    def step(chunks, clens, dlens):
        fn = functools.partial(lz4_device._decode_block, C=C, B=B,
                               MAXTOK=MAXTOK)
        return jax.vmap(fn)(chunks, clens, dlens)

    return jax.jit(step,
                   in_shardings=(shard2, shard, shard),
                   out_shardings=shard2)


def make_training_step(block_size: int, mesh: Mesh,
                       axis_name: str = "blocks"):
    """The framework's "full step" over a mesh: encode every block shard,
    all-gather sizes, and reduce aggregate stats (compressed bytes, ratio).

    This is what `__graft_entry__.dryrun_multichip` compiles: real dp
    sharding over the mesh with an explicit shard_map + psum collective for
    the stats reduction (ICI), plus the replicated size gather.
    """
    B = block_size
    fn, _outcap = lz4_device.encoder_block_fn(B, 0)
    shard2 = NamedSharding(mesh, P(axis_name, None))
    shard1 = NamedSharding(mesh, P(axis_name))

    def local_encode(blocks, lens):
        bodies, sizes, tails, _flags = jax.vmap(fn)(blocks, lens)
        # per-shard stats -> global via psum over the mesh axis (ICI)
        local_bytes = jnp.sum(sizes)
        total_bytes = jax.lax.psum(local_bytes, axis_name)
        total_in = jax.lax.psum(jnp.sum(lens), axis_name)
        # all blocks' sizes visible everywhere for container assembly
        all_sizes = jax.lax.all_gather(sizes, axis_name, tiled=True)
        all_tails = jax.lax.all_gather(tails, axis_name, tiled=True)
        return bodies, all_sizes, all_tails, total_bytes, total_in

    step = jax.shard_map(
        local_encode, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name)),
        out_specs=(P(axis_name, None), P(), P(), P(), P()),
        check_vma=False)

    return jax.jit(step, in_shardings=(shard2, shard1))


def compress_sharded(data: bytes, block_size: int,
                     mesh: Optional[Mesh] = None):
    """Host-facing sharded compress: returns (bodies, tails) per block, with
    the batch padded to a multiple of the mesh size."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    from .container import split_blocks
    blocks = split_blocks(data, block_size)
    n = len(blocks)
    n_pad = -(-n // n_dev) * n_dev
    B = block_size
    arr = np.zeros((n_pad, B), dtype=np.uint8)
    lens = np.zeros(n_pad, dtype=np.int32)
    for i, b in enumerate(blocks):
        arr[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    enc = make_sharded_encoder(B, mesh)
    bodies, sizes, tails, _flags = enc(jnp.asarray(arr), jnp.asarray(lens))
    bodies_np = np.asarray(bodies)
    sizes_np = np.asarray(sizes)
    tails_np = np.asarray(tails)
    return ([bodies_np[i, :sizes_np[i]].tobytes() for i in range(n)],
            [int(t) for t in tails_np[:n]])


def compress_blocks_mesh(blocks, accel: int = 1,
                         num_shards: Optional[int] = None):
    """Mesh-tier batch encode behind the unified API (VERDICT item 4):
    shards the block axis over up to `num_shards` devices via the jitted
    sharded encoder and returns the same (bodies, tails) contract as
    lz4_device.encode_blocks — identical streams, any mesh size.

    Reference analog: the MT path behind the same public entry points
    (algos/lz4/lz4.c:2655, threads/threads.c:46).
    """
    from ..ops import lz4_device
    lz4_device.check_block_sizes(blocks)
    ndev = len(jax.devices())
    shards = min(num_shards or ndev, ndev, max(1, len(blocks)))
    if shards <= 1:
        return lz4_device.encode_blocks(blocks, accel)
    mesh = make_mesh(shards)
    B = lz4_device._bucket(max(len(b) for b in blocks))
    G = lz4_device.grid_for_accel(accel)
    if G and G * 4 > B:
        G = 0
    n = len(blocks)
    n_pad = -(-n // shards) * shards
    arr = np.zeros((n_pad, B), dtype=np.uint8)
    lens = np.zeros(n_pad, dtype=np.int32)
    for i, b in enumerate(blocks):
        arr[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    enc = make_sharded_encoder(B, mesh, G=G)
    bodies, sizes, tails, flags = jax.block_until_ready(
        enc(jnp.asarray(arr), jnp.asarray(lens)))
    bodies_np = np.asarray(bodies)
    sizes_np = np.asarray(sizes)
    out = [bodies_np[i, :sizes_np[i]].tobytes() for i in range(n)]
    tails_out = [int(t) for t in np.asarray(tails)[:n]]
    flags_np = np.asarray(flags)[:n]
    if flags_np.any():
        from ..codecs.lz4_stitch import final_sequence_len
        from ..runtime import native
        for i in np.nonzero(flags_np)[0]:
            stream, t = native.lz4_compress_tail(blocks[i], max(accel, 1))
            out[i] = stream[:len(stream) - final_sequence_len(t)]
            tails_out[i] = t
    return out, tails_out


def sharded_block_call(blocks, encode_fn, num_shards: Optional[int] = None,
                       axis_name: str = "blocks"):
    """Generic mesh-tier wrapper for any ops-level `encode_blocks`-style
    function: pads the block list to a multiple of the shard count and
    hands `encode_fn` the padded list plus a (rows, lens) sharding pair
    to `jax.device_put` its batch arrays with — XLA's GSPMD then
    partitions the jitted vmapped encoder over the mesh (the reference's
    MT fan-out for zlib/zstd/snappy behind the same entry points,
    threads/threads.c:46).

    encode_fn(padded_blocks, shardings) must return per-block results for
    the padded list; the first len(blocks) entries are returned.
    """
    ndev = len(jax.devices())
    shards = min(num_shards or ndev, ndev, max(1, len(blocks)))
    if shards <= 1:
        return encode_fn(list(blocks), None)
    mesh = make_mesh(shards)
    shard2 = NamedSharding(mesh, P(axis_name, None))
    shard1 = NamedSharding(mesh, P(axis_name))
    n = len(blocks)
    n_pad = -(-n // shards) * shards
    padded = list(blocks) + [blocks[-1]] * (n_pad - n)
    results = encode_fn(padded, (shard2, shard1))
    if isinstance(results, tuple):
        return tuple(r[:n] for r in results)
    return results[:n]


def decompress_blocks_mesh(chunks, dlens, block_size: int,
                           num_shards: Optional[int] = None):
    """Mesh-tier RAP decode fan-out: chunk regions sharded over devices."""
    from ..ops import lz4_device
    ndev = len(jax.devices())
    shards = min(num_shards or ndev, ndev, max(1, len(chunks)))
    if shards <= 1:
        return lz4_device.decode_blocks(chunks, dlens, block_size)
    if max(dlens, default=0) > lz4_device.MAX_DEVICE_BLOCK:
        raise ValueError("device decode: block exceeds the 64 KiB limit")
    mesh = make_mesh(shards)
    C = lz4_device._bucket(max((len(c) for c in chunks), default=1))
    B = lz4_device._bucket(max(max(dlens), block_size))
    n = len(chunks)
    n_pad = -(-n // shards) * shards
    arr = np.zeros((n_pad, C), dtype=np.uint8)
    clens = np.zeros(n_pad, dtype=np.int32)
    dl = np.zeros(n_pad, dtype=np.int32)
    for i, c in enumerate(chunks):
        arr[i, :len(c)] = np.frombuffer(c, dtype=np.uint8)
        clens[i] = len(c)
        dl[i] = dlens[i]
    dec = make_sharded_decoder(C, B, mesh)
    out = jax.block_until_ready(
        dec(jnp.asarray(arr), jnp.asarray(clens), jnp.asarray(dl)))
    out_np = np.asarray(out)
    return [out_np[i, :dlens[i]].tobytes() for i in range(n)]
