#!/usr/bin/env python
"""Build the 4-file "realset" perf corpus used by MEASURED.md.

The reference benches on Silesia (test/CMakeLists.txt:53-75); no network
here, so the realset uses real bytes available on this box:

  csrc.c      - concatenated C sources from the reference tree (text/code)
  libc        - the glibc shared object (ELF machine code)
  pysrc       - concatenated Python stdlib sources (text)
  records.bin - synthetic structured 64-byte records with noise

Usage: python scripts/make_realset.py [/tmp/realset]
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

CAP = 8 << 20  # 8 MiB per file


def _concat(patterns: list[str], cap: int) -> bytes:
    out = bytearray()
    for pat in patterns:
        for path in sorted(glob.glob(pat)):
            if len(out) >= cap:
                break
            try:
                with open(path, "rb") as f:
                    out += f.read(cap)
            except OSError:
                pass
    return bytes(out[:cap])


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/realset"
    os.makedirs(dst, exist_ok=True)

    csrc = _concat(["/root/reference/algos/*/*.c",
                    "/root/reference/algos/*/*.h",
                    "/root/reference/algos/zstd/lib/*/*.c"], CAP)
    with open(os.path.join(dst, "csrc.c"), "wb") as f:
        f.write(csrc)

    libc = _concat(["/usr/lib/x86_64-linux-gnu/libc.so*",
                    "/usr/lib/x86_64-linux-gnu/libm.so*",
                    "/usr/lib/x86_64-linux-gnu/libstdc++.so*"], CAP)
    with open(os.path.join(dst, "libc"), "wb") as f:
        f.write(libc)

    pysrc = _concat([os.path.dirname(os.__file__) + "/*.py",
                     os.path.dirname(os.__file__) + "/*/*.py"], CAP)
    with open(os.path.join(dst, "pysrc"), "wb") as f:
        f.write(pysrc)

    rng = np.random.default_rng(7)
    rec = rng.integers(0, 256, 64, dtype=np.uint8)
    out = np.tile(rec, CAP // 64)
    noise_at = rng.integers(0, len(out), len(out) // 50)
    out[noise_at] = rng.integers(0, 256, len(noise_at), dtype=np.uint8)
    with open(os.path.join(dst, "records.bin"), "wb") as f:
        f.write(out.tobytes())

    for name in ("csrc.c", "libc", "pysrc", "records.bin"):
        p = os.path.join(dst, name)
        print(f"{p}: {os.path.getsize(p)} bytes")


if __name__ == "__main__":
    main()
