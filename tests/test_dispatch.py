"""Dispatcher tests — the reference's ISA/dispatcher audit strategy
(/root/reference/gtest/utils/utils_gtest.cpp:70-147): cap the tier via env,
run, assert no variant above the cap was hit
(validate_simd_func_access parity)."""

import os

import pytest

import aocl_compression_tpu as actpu
from aocl_compression_tpu.utils import dispatch
from aocl_compression_tpu.utils.config import (TIER_HOST, TIER_XLA,
                                               max_tier_from_env)


@pytest.fixture(autouse=True)
def _clean_env():
    saved = {k: os.environ.pop(k, None)
             for k in ("AOCL_ENABLE_INSTRUCTIONS", "AOCL_DISABLE_OPT")}
    # keep codec runs inside these tests on the host tier unless a test
    # explicitly overrides (device tiers compile slowly on the CPU backend)
    os.environ["AOCL_ENABLE_INSTRUCTIONS"] = "HOST"
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def test_env_tier_cap():
    os.environ["AOCL_ENABLE_INSTRUCTIONS"] = "HOST"
    assert max_tier_from_env() == TIER_HOST
    os.environ["AOCL_ENABLE_INSTRUCTIONS"] = "XLA"
    assert max_tier_from_env() == TIER_XLA
    # reference ISA names are accepted as aliases
    os.environ["AOCL_ENABLE_INSTRUCTIONS"] = "SSE2"
    assert max_tier_from_env() == TIER_HOST


def test_disable_opt_forces_host():
    os.environ["AOCL_DISABLE_OPT"] = "1"
    assert max_tier_from_env() == TIER_HOST


def test_audit_records_hits(corpus):
    dispatch.enable_audit(True)
    try:
        h = actpu.setup("lz4")
        c = actpu.compress(h, corpus["text_64k"])
        actpu.decompress(h, c, expected_size=len(corpus["text_64k"]))
        hits = dispatch.audit_hits()
        assert any("lz4" in name for name in hits)
    finally:
        dispatch.enable_audit(False)


def test_audit_validates_tier_cap(corpus):
    os.environ["AOCL_DISABLE_OPT"] = "1"
    dispatch.enable_audit(True)
    try:
        h = actpu.setup("lz4")
        c = actpu.compress(h, corpus["text_300k"])
        actpu.decompress(h, c)
        assert dispatch.validate_tier_access(TIER_HOST)
    finally:
        dispatch.enable_audit(False)


def test_opt_off_handle_forces_host(corpus):
    dispatch.enable_audit(True)
    try:
        h = actpu.setup("lz4", opt_off=True)
        c = actpu.compress(h, corpus["text_300k"])
        actpu.decompress(h, c)
        assert dispatch.validate_tier_access(TIER_HOST)
    finally:
        dispatch.enable_audit(False)


def test_resolve_fallback_to_lowest():
    @dispatch.register("testcodec", "op", TIER_XLA, "testcodec_op_xla")
    def _impl():
        return "xla"
    # cap below the only registered tier still resolves (scalar fallback)
    fn = dispatch.resolve("testcodec", "op", max_tier=TIER_HOST)
    assert fn() == "xla"


def test_resolve_unknown_raises():
    with pytest.raises(KeyError):
        dispatch.resolve("nope", "nothing")
