"""Scalar prototype 2: fixed-table Huffman literals for zstd blocks.
Everything here gets baked as constants for the device encoder."""
import math, struct
import zstandard

# ---------- choose fixed weights ---------------------------------------------
# English/binary-mix-ish literal distribution: frequent bytes get higher
# weight. Weight w -> share 2^(w-1); nbBits = maxBits+1-w.
def make_weights():
    w = [1] * 256
    common = b" etaoinshrdlcumwfgypbvk0123456789ET\nAIS.,_-=/:<>()[]{}'\"+*"
    for i, c in enumerate(common):
        w[c] = 5 if i < 12 else 4
    for c in b"\x00\xff\x01\x02\x03\x04":
        w[c] = 5
    return w

def complete_weights(w):
    """Adjust so sum(2^(w-1)) is a power of two by raising the 'last' share
    via the implicit final weight: we instead tune explicit weights until the
    sum is already 2^k minus a final implicit weight share."""
    # Spec: decoder receives weights for symbols 0..N-2 (N-1 listed) and the
    # LAST symbol's weight is implicit: 2^(wlast-1) completes sum to 2^k.
    # We pick explicit weights for 0..254 and let symbol 255 be implicit.
    s = sum(1 << (x - 1) for x in w[:255])
    k = s.bit_length()  # smallest power of two > s... need strict gap
    target = 1 << k
    gap = target - s
    # gap must be a power of two = 2^(w255-1)
    while gap & (gap - 1):
        # bump weight of symbol 0 down/up to fix; simplest: raise w[32] share
        # find a symbol to increment by 1 (adds its share again)
        for i in range(255):
            add = 1 << (w[i] - 1)
            if gap - add > 0 and ((gap - add) & (gap - add - 1)) == 0 if False else False:
                pass
        # easier: set some filler symbol's weight to make s hit target/2..
        # adjust: increment w of symbol 254 by 1 and recompute
        w[254] += 1
        s = sum(1 << (x - 1) for x in w[:255])
        k = s.bit_length()
        target = 1 << k
        gap = target - s
        assert w[254] < 11
    w255 = gap.bit_length()  # gap = 2^(w255-1)
    assert (1 << (w255 - 1)) == gap
    maxbits = k
    return w, w255, maxbits

W, W255, MAXBITS = complete_weights(make_weights())
FULLW = W[:255] + [W255]
print("maxbits", MAXBITS, "w255", W255)

# ---------- canonical code assignment (must match HUF_readDTableX1) ----------
def build_codes(fullw, maxbits):
    # nbBits = maxbits + 1 - w (w >= 1)
    nb = [0 if w == 0 else maxbits + 1 - w for w in fullw]
    # decoder fills table by weight ascending? codes: standard canonical with
    # longest codes first at 0? Per RFC: "Symbols are sorted by Weight.
    # Within same Weight, symbols keep natural sequential order. Symbols with
    # a Weight of zero are removed. Then, starting from the lowest Weight,
    # their Weights are listed... codes are assigned from the lowest weight"
    # Lowest weight = longest code; assign increasing code values starting 0.
    order = sorted(range(256), key=lambda s: (fullw[s], s))
    codes = [0] * 256
    cur = 0
    prev_nb = None
    for s in order:
        if fullw[s] == 0:
            continue
        n = nb[s]
        if prev_nb is not None and n != prev_nb:
            cur >>= (prev_nb - n)
        codes[s] = cur
        cur += 1
        prev_nb = n
    return codes, nb

CODES, NBITS = build_codes(FULLW, MAXBITS)

# ---------- FSE compression of the weight sequence ----------------------------
def normalize(freqs, tablelog):
    total = sum(freqs)
    scale = (1 << tablelog)
    norm = [0]*len(freqs)
    # simple largest remainder normalization with -1 for rare symbols
    rest = scale
    for s, f in enumerate(freqs):
        if f == 0: continue
        share = f * scale / total
        if share < 1.0:
            norm[s] = -1
            rest -= 1
        else:
            norm[s] = int(share)
            rest -= norm[s]
    # distribute remainder to the largest symbol
    big = max(range(len(freqs)), key=lambda s: freqs[s])
    norm[big] += rest
    assert sum(abs(x) if x == -1 else x for x in []) is not None
    assert sum((1 if x == -1 else x) for x in norm) == scale, (norm, scale)
    return norm

def write_fse_table_desc(norm, tablelog):
    """RFC 3.1.1.3.1.5 FSE table description bit-writer (forward bits)."""
    bits = []
    def put(v, n):
        for k in range(n):
            bits.append((v >> k) & 1)
    put(tablelog - 5, 4)
    remaining = (1 << tablelog) + 1   # +1 total, counts as value+1
    s = 0
    while remaining > 1 and s < len(norm):
        # skip handled via zero-probability repeat flags
        v = norm[s]
        c = v + 1 if v >= -1 else 0   # encoded as value+1; -1 -> 0.. wait
        # encoding: Proba = value; stored = Proba + 1 (where -1 stored as 0?)
        # RFC: "values are remapped: stored value = Proba+1, with Proba=-1
        # represented by stored 0"? Actually: stored value v: 0 => proba -1;
        # 1 => proba 0 is skipped differently... Per RFC: counts are stored
        # as Count+1 where Count=-1 is "less than 1" => stored 0
        stored = v + 1
        maxv = remaining + 1          # max stored value
        nbbits = maxv.bit_length()    # = ceil(log2(maxv+1))? use RFC rule
        nbbits = (maxv - 1).bit_length() + 1 if False else max(1, (maxv).bit_length())
        # RFC: "the number of bits required to encode max is log2(max)+1;
        # small values use one less bit": threshold coding:
        nbBits = (maxv).bit_length()
        lowthresh = (1 << nbBits) - 1 - maxv
        if stored < lowthresh:
            put(stored, nbBits - 1)
        else:
            val = stored if stored < lowthresh else stored + lowthresh if False else stored
            # large values: add lowthresh when above threshold window
            v2 = stored + lowthresh if stored >= lowthresh else stored
            # values in [lowthresh, 2*lowthresh) ambiguous region handling:
            # per spec: if value >= lowthresh: write (value + lowthresh) in
            # nbBits where the top distinguishes
            put(v2, nbBits)
        remaining -= abs(v) if v != 0 else 0
        remaining -= 1 if v == -1 else 0
        remaining += 1 if v == -1 else 0
        remaining -= (v if v > 0 else 1 if v == -1 else 0)
        s += 1
        if v == 0:
            # zero repeat flag: 2 bits count of additional zeros
            z = 0
            while s < len(norm) and norm[s] == 0 and z < 3:
                z += 1; s += 1
            put(z, 2)
            while z == 3:
                z = 0
                while s < len(norm) and norm[s] == 0 and z < 3:
                    z += 1; s += 1
                put(z, 2)
                if z < 3: break
    # pad to byte
    while len(bits) % 8: bits.append(0)
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for k in range(8): b |= bits[i+k] << k
        out.append(b)
    return bytes(out)
print("prototype scaffolding ok")
