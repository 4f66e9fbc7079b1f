#!/usr/bin/env python
"""Frame anatomy of a zstd stream: per-block literal/sequence accounting.

Walks block headers (RFC 8878) and parses each compressed block's
literals-section header and sequence count, without decoding payloads.
Used to attribute ratio gaps (ours vs stock) to literals bytes vs
sequence bytes vs sequence count.
"""

from __future__ import annotations

import sys


def anatomy(buf: bytes, label: str) -> None:
    p = 0
    magic = int.from_bytes(buf[0:4], "little")
    assert magic == 0xFD2FB528, hex(magic)
    p = 4
    fhd = buf[p]
    p += 1
    dictid_f = fhd & 3
    content_f = fhd >> 6
    single_seg = (fhd >> 5) & 1
    checksum = (fhd >> 2) & 1
    if not single_seg:
        p += 1  # window descriptor
    p += (0, 1, 2, 4)[dictid_f]
    p += (1 if single_seg else 0, 2, 4, 8)[content_f]

    blocks = 0
    raw_blocks = rle_blocks = comp_blocks = 0
    lit_raw = lit_comp_bytes = 0
    lit_regen = 0
    nseq_total = 0
    seq_bytes = 0
    comp_total = 0
    while True:
        bh = int.from_bytes(buf[p:p + 3], "little")
        p += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        blocks += 1
        if btype == 0:
            raw_blocks += 1
            p += bsize
        elif btype == 1:
            rle_blocks += 1
            p += 1
        else:
            comp_blocks += 1
            comp_total += bsize
            q = p
            lh = buf[q]
            lt = lh & 3
            sf = (lh >> 2) & 3
            if lt in (0, 1):  # raw / RLE literals
                if sf in (0, 2):
                    rs = lh >> 3
                    hdr = 1
                elif sf == 1:
                    rs = (int.from_bytes(buf[q:q + 2], "little")) >> 4
                    hdr = 2
                else:
                    rs = (int.from_bytes(buf[q:q + 3], "little")) >> 4
                    hdr = 3
                lit_regen += rs
                body = rs if lt == 0 else 1
                if lt == 0:
                    lit_raw += rs
                q += hdr + body
            else:  # compressed / treeless
                if sf in (0, 1):
                    v = int.from_bytes(buf[q:q + 3], "little")
                    rs = (v >> 4) & 0x3FF
                    cs = v >> 14
                    hdr = 3
                elif sf == 2:
                    v = int.from_bytes(buf[q:q + 4], "little")
                    rs = (v >> 4) & 0x3FFF
                    cs = v >> 18
                    hdr = 4
                else:
                    v = int.from_bytes(buf[q:q + 5], "little")
                    rs = (v >> 4) & 0x3FFFF
                    cs = v >> 22
                    hdr = 5
                lit_regen += rs
                lit_comp_bytes += cs + hdr
                q += hdr + cs
            b0 = buf[q]
            if b0 < 128:
                nseq = b0
                q += 1
            elif b0 < 255:
                nseq = ((b0 - 128) << 8) + buf[q + 1]
                q += 2
            else:
                nseq = int.from_bytes(buf[q + 1:q + 3], "little") + 0x7F00
                q += 3
            nseq_total += nseq
            seq_bytes += (p + bsize) - q
            p += bsize
        if last:
            break
    if checksum:
        p += 4
    print(f"{label}: total {len(buf)} | blocks {blocks} "
          f"(raw {raw_blocks} rle {rle_blocks} comp {comp_blocks})")
    print(f"  literals: regen {lit_regen} (raw-coded {lit_raw}), "
          f"compressed-section bytes {lit_comp_bytes}")
    print(f"  sequences: {nseq_total} seqs in {seq_bytes} bytes "
          f"({seq_bytes / max(1, nseq_total):.3f} B/seq)")


def main() -> None:
    import zstandard
    sys.path.insert(0, ".")
    from aocl_compression_tpu.runtime import native
    path = sys.argv[1]
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    data = open(path, "rb").read()
    anatomy(native.zstd_compress(data, level), "ours ")
    anatomy(zstandard.ZstdCompressor(level=level).compress(data), "stock")


if __name__ == "__main__":
    main()
