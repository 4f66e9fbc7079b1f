#!/usr/bin/env python
"""Generate a synthetic benchmark corpus (Silesia/Calgary stand-in).

The reference downloads Silesia/Calgary/Canterbury at configure time
(/root/reference/test/CMakeLists.txt:53-75); this environment has no
network, so tests and perf reports use files with the same character:
text-like, structured-binary, periodic, and incompressible payloads.

Usage: python scripts/make_corpus.py OUT_DIR [--size-mb N]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def text_like(n: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    words = [b"the ", b"of ", b"compression ", b"data ", b"block ",
             b"match ", b"hash ", b"entropy ", b"stream ", b"window ",
             b"and ", b"with ", b"for ", b"framework ", b"parallel "]
    parts, n_out = [], 0
    while n_out < n:
        w = words[rng.integers(0, len(words))]
        parts.append(w)
        n_out += len(w)
        if rng.random() < 0.04:
            parts.append(b"\n")
            n_out += 1
    return b"".join(parts)[:n]


def records(n: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    rec = rng.integers(0, 256, 64, dtype=np.uint8)
    out = np.tile(rec, n // 64 + 1)
    noise_at = rng.integers(0, len(out), len(out) // 50)
    out[noise_at] = rng.integers(0, 256, len(noise_at), dtype=np.uint8)
    return out.tobytes()[:n]


def periodic(n: int, seed: int) -> bytes:
    return (b"abcdefxyz0123" * (n // 13 + 1))[:n]


def random_bytes(n: int, seed: int) -> bytes:
    return np.random.default_rng(seed).integers(
        0, 256, n, dtype=np.uint8).tobytes()


def mixed(n: int, seed: int) -> bytes:
    t = n // 3
    return text_like(t, seed) + records(t, seed + 1) \
        + random_bytes(n - 2 * t, seed + 2)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--size-mb", type=int, default=4)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    n = args.size_mb << 20
    for name, fn in [("text.txt", text_like), ("records.bin", records),
                     ("periodic.dat", periodic), ("random.bin", random_bytes),
                     ("mixed.dat", mixed)]:
        path = os.path.join(args.out_dir, name)
        with open(path, "wb") as f:
            f.write(fn(n, hash(name) & 0xFFFF))
        print(path)


if __name__ == "__main__":
    main()
