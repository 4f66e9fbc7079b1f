"""The C-level unified API (csrc/llc_api.h) must be usable from a plain C
program — the reference is a C library (api/aocl_compression.h) and this
is the drop-in host-path surface for C callers. Compiles and runs the
shipped example against the built runtime."""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    subprocess.run(["which", "gcc"], capture_output=True).returncode != 0,
    reason="gcc not available")
def test_c_api_roundtrip_all_methods(tmp_path):
    from aocl_compression_tpu.runtime import native
    native.get_lib()  # ensure the .so is built
    exe = tmp_path / "llc_test"
    r = subprocess.run(
        ["gcc", "-I", os.path.join(REPO, "csrc"),
         os.path.join(REPO, "docs", "examples", "llc_c_api_example.c"),
         "-L", os.path.join(REPO, "csrc"), "-l:libaocl_tpu_host.so",
         "-o", str(exe)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    env = dict(os.environ, LD_LIBRARY_PATH=os.path.join(REPO, "csrc"))
    r = subprocess.run([str(exe)], capture_output=True, text=True, env=env,
                       timeout=120)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert r.stdout.count("method") == 7
    assert "version:" in r.stdout
