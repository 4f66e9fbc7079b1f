"""Mutation-fuzz the native C surfaces under AddressSanitizer.

Reference parity: the ASAN build option (CMakeLists.txt:487-506) plus the
build-then-mutate gtest pattern (gtest/lz4/lz4_gtest.cpp:212-299). The
fuzz driver (scripts/fuzz_native.py) compresses real payloads with every
codec, then mutates the streams (bit flips, truncation, extension,
splices, header hammering) and drives every decode entry point; ASAN
aborts the subprocess on any out-of-bounds access.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASAN_LIB = os.path.join(REPO, "csrc", "libaocl_tpu_host_asan.so")


def _libasan():
    try:
        out = subprocess.run(["g++", "-print-file-name=libasan.so"],
                             capture_output=True, text=True, check=True)
        path = out.stdout.strip()
        return path if os.path.sep in path and os.path.exists(path) else None
    except (OSError, subprocess.CalledProcessError):
        return None


@pytest.mark.skipif(_libasan() is None, reason="libasan not available")
def test_mutation_fuzz_asan():
    r = subprocess.run(["make", "-C", os.path.join(REPO, "csrc"), "asan",
                        "-s"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    env = dict(os.environ,
               LD_PRELOAD=_libasan(),
               ASAN_OPTIONS="detect_leaks=0")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fuzz_native.py"),
         "--lib", ASAN_LIB, "--runs", "1500", "--seed", "7"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-3000:])
    assert "fuzz ok" in r.stdout


def test_mutation_fuzz_plain():
    """Same driver against the production lib (no sanitizer): mutated
    streams must never crash the process, whatever the return codes."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fuzz_native.py"),
         "--runs", "1500", "--seed", "11"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-3000:])
