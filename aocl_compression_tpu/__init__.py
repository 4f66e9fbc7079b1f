"""aocl_compression_tpu — a TPU-native lossless-compression framework.

A from-scratch JAX/XLA/Pallas + C++ framework with the capabilities of
AOCL-Compression (reference: /root/reference): seven codecs (lz4, lz4hc,
snappy, zlib, zstd, bzip2, lzma) behind one unified API, backend-tier
dispatch with env override + audit, block-parallel compress/decompress via a
byte-compatible RAP container, sharded across TPU device meshes.

Quick start:

    import aocl_compression_tpu as actpu
    h = actpu.setup("lz4", measure_stats=True)
    c = actpu.compress(h, data)
    d = actpu.decompress(h, c)
    actpu.destroy(h)
"""

from .api import (CompressionError, ErrorCode, Handle, Method,  # noqa: F401
                  Stats, compress, compress_bound, decompress, destroy,
                  get_codec, list_codecs, setup, version)
from .streaming import CompressStream, DecompressStream  # noqa: F401
from .utils.config import get_config, set_config  # noqa: F401

__version__ = "2.0.0"
