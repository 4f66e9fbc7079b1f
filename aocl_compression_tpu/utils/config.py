"""Typed configuration with environment overrides.

TPU-native equivalent of the reference's three-layer config system
(/root/reference/CMakeLists.txt:61-90 build options,
/root/reference/algos/common/aoclAlgoOpt.h:38-81 ISA master switches,
/root/reference/utils/utils.cpp:125-146,207-219 runtime env vars).

Precedence matches the reference: env > handle > default.

The reference's ISA tiers (scalar/SSE2/AVX/AVX2/AVX512, optLevel 0-4) map to
*backend tiers* here: which implementation of a codec runs.

  0 = HOST    — host C++/stdlib reference path (the "scalar" analog)
  1 = XLA     — vectorized JAX/XLA device pipeline
  2 = PALLAS  — hand-written Pallas TPU kernels for the hot stages
  3 = MESH    — sharded multi-device pipeline (shard_map over a Mesh)

Env vars (names kept AOCL-compatible where the semantic matches):
  AOCL_ENABLE_INSTRUCTIONS ∈ {HOST, XLA, PALLAS, MESH} — caps the backend tier
    (reference: caps ISA tier, utils/utils.cpp:125-146).
  AOCL_DISABLE_OPT — any value forces tier 0 (reference: utils.cpp:207-219).
  AOCL_ENABLE_LOG ∈ {ERR, INFO, DEBUG, TRACE} — log level (utils/utils.h:134-153).
"""

from __future__ import annotations

import dataclasses
import os

TIER_HOST = 0
TIER_XLA = 1
TIER_PALLAS = 2
TIER_MESH = 3

_TIER_NAMES = {"HOST": TIER_HOST, "XLA": TIER_XLA, "PALLAS": TIER_PALLAS,
               "MESH": TIER_MESH,
               # Accept the reference's ISA names too, mapped onto tiers, so
               # scripts written against AOCL env conventions keep working.
               "SSE2": TIER_HOST, "AVX": TIER_XLA, "AVX2": TIER_PALLAS,
               "AVX512": TIER_MESH}

TIER_LABELS = {v: k for k, v in list(_TIER_NAMES.items())[:4]}


def max_tier_from_env(default: int = TIER_MESH) -> int:
    """Resolve the maximum allowed backend tier (env > default)."""
    if os.environ.get("AOCL_DISABLE_OPT") is not None:
        return TIER_HOST
    val = os.environ.get("AOCL_ENABLE_INSTRUCTIONS")
    if val:
        return _TIER_NAMES.get(val.strip().upper(), default)
    return default


def forced_tier_from_env():
    """Tier explicitly named by AOCL_ENABLE_INSTRUCTIONS, or None.

    An explicit device-tier name is a user demand to run that backend
    (the reference's AOCL_ENABLE_INSTRUCTIONS semantic) — it bypasses
    the measured-speed routing in dispatch (utils.calibration)."""
    if os.environ.get("AOCL_DISABLE_OPT") is not None:
        return TIER_HOST
    val = os.environ.get("AOCL_ENABLE_INSTRUCTIONS")
    if val:
        return _TIER_NAMES.get(val.strip().upper())
    return None


@dataclasses.dataclass
class FrameworkConfig:
    """Global knobs, mirroring the reference's CMake option matrix.

    Reference options (CMakeLists.txt:61-90) that are compile-time there are
    runtime-toggleable here; per-codec exclusion maps to registry filtering.
    """

    # Per-codec enable switches (reference: AOCL_EXCLUDE_<CODEC> options).
    enabled_codecs: tuple = ("lz4", "lz4hc", "snappy", "zlib", "zstd",
                             "bzip2", "lzma")
    # RAP multi-block container support (reference: AOCL_ENABLE_THREADS).
    enable_rap: bool = True
    # Default block size for device pipelines; the RAP chunking invariant is
    # chunk >= codec search window (threads/threads.c:57 win_len*WINDOW_FACTOR).
    default_block_size: int = 64 * 1024
    # Unit-test instrumentation (reference: AOCL_UNIT_TEST hit counters).
    enable_audit: bool = False
    # Device (XLA-tier) decompression opt-in. Measured round 1: the device
    # LZ77 back-reference resolve is gather-bound and slower than the host
    # C++ path, so RAP decode routes to HOST unless explicitly enabled
    # (env AOCL_DEVICE_DECODE=1 or set_config(device_decode=True)).
    device_decode: bool = False


def device_decode_enabled() -> bool:
    if os.environ.get("AOCL_DEVICE_DECODE") is not None:
        return os.environ["AOCL_DEVICE_DECODE"] not in ("0", "")
    return _config.device_decode


_config = FrameworkConfig()


def get_config() -> FrameworkConfig:
    return _config


def set_config(**kwargs) -> FrameworkConfig:
    global _config
    _config = dataclasses.replace(_config, **kwargs)
    return _config
