"""Scalar prototype: hand-rolled zstd frame (raw literals + predefined-FSE
sequences) -> must decode with zstandard. Step 1: simplest possible —
raw literals, one sequence, then iterate."""
import struct
import zstandard

# ---------- bit writer (little-endian accumulation, backward-read stream) ----
class BitWriter:
    def __init__(self):
        self.bits = []
    def add(self, value, nbits):
        for k in range(nbits):
            self.bits.append((value >> k) & 1)
    def close(self):
        self.bits.append(1)  # end marker
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for k in range(8):
                b |= self.bits[i+k] << k
            out.append(b)
        return bytes(out)

# ---------- predefined FSE tables (RFC 8878) ---------------------------------
LL_DEFAULT = [4,3,2,2,2,2,2,2,2,2,2,2,2,1,1,1,2,2,2,2,2,2,2,2,2,3,2,1,1,1,1,1,
              -1,-1,-1,-1]
ML_DEFAULT = [1,4,3,2,2,2,2,2,2,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,
              1,1,1,1,1,1,1,1,1,1,1,1,1,1,-1,-1,-1,-1,-1,-1,-1]
OF_DEFAULT = [1,1,1,1,1,1,2,2,2,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,-1,-1,-1,-1,-1]
LL_LOG, ML_LOG, OF_LOG = 6, 6, 5

LL_BASE = [0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,18,20,22,24,28,32,40,48,
           64,128,256,512,1024,2048,4096,8192,16384,32768,65536]
LL_BITS = [0]*16 + [1,1,1,1,2,2,3,3,4,6,7,8,9,10,11,12,13,14,15,16]
ML_BASE = [3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21,22,23,24,25,26,
           27,28,29,30,31,32,33,34,35,37,39,41,43,47,51,59,67,83,99,131,259,
           515,1027,2051,4099,8195,16387,32771,65539]
ML_BITS = [0]*32 + [1,1,1,1,2,2,3,3,4,4,5,7,8,9,10,11,12,13,14,15,16]

def fse_build_decode(dist, tablelog):
    """RFC distribution -> decode table (symbol per state) — spec layout."""
    size = 1 << tablelog
    table = [-1]*size
    # -1 ("less than 1") symbols get one state at the END
    hi = size - 1
    for s, p in enumerate(dist):
        if p == -1:
            table[hi] = s
            hi -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, p in enumerate(dist):
        if p <= 0:
            continue
        for _ in range(p):
            table[pos] = s
            pos = (pos + step) & mask
            while pos > hi:
                pos = (pos + step) & mask
    assert all(t >= 0 for t in table)
    # per-state: (symbol, nbBits, baseline) like the reference decoder
    cnt = {}
    nstates = {}
    for s, p in enumerate(dist):
        nstates[s] = abs(p) if p != 0 else 0
    # assign per state in state order: for each symbol, its states sorted by
    # state index get increasing "counts"
    occs = {s: [] for s in range(len(dist))}
    for st, s in enumerate(table):
        occs[s].append(st)
    decode = [None]*size
    for s, sts in occs.items():
        n = len(sts)
        if n == 0:
            continue
        hbits = tablelog - (n-1).bit_length()  # highest power of 2 <= n... per spec
        # spec: nbBits = tablelog - floor(log2(n)) for the "double" states
        import math
        lg = (n).bit_length() - 1  # floor(log2 n)
        # number of states with nbBits = tablelog - lg is 2*n - 2^(lg+1)?? use spec:
        # "first states get nbBits = tablelog - floor(log2(n)) ... "
        # canonical: next_pow2 = 1 << ceil(log2(n)); n_double = next_pow2 - n
        ceil_lg = math.ceil(math.log2(n)) if n > 1 else 0
        next_pow2 = 1 << ceil_lg
        n_small = next_pow2 - n          # states with (tablelog - ceil_lg + 1)?? 
        # Per RFC: the n states (in increasing state order) are assigned:
        # the first (next_pow2 - n)... actually: baselines start after wrap.
        # Use the reference algorithm: 
        for i, st in enumerate(sts):
            if i < n_small:
                nb = tablelog - ceil_lg + 1
                base = (n_small + i - n_small)  # fix below
            else:
                nb = tablelog - ceil_lg
            decode[st] = [s, 0, 0]
        # baseline assignment: states in order; the ones with larger nb wrap
        # around. Standard FSE: baseline for i-th occurrence:
        # start = ((i + n_small) % n)?? Implement exactly like educational FSE:
        # skip for now (encoder-only needs encode table)
    return table

# Encoder table build (FSE): what the encoder needs:
def fse_build_encode(dist, tablelog):
    size = 1 << tablelog
    table = [-1]*size
    hi = size - 1
    freq = [abs(p) if p != 0 else 0 for p in dist]
    singles = []
    for s, p in enumerate(dist):
        if p == -1:
            table[hi] = s
            hi -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, p in enumerate(dist):
        if p <= 0:
            continue
        for _ in range(p):
            table[pos] = s
            pos = (pos + step) & mask
            while pos > hi:
                pos = (pos + step) & mask
    # cumul
    cumul = [0]
    for f in freq:
        cumul.append(cumul[-1] + f)
    # sort states by symbol then state -> nextState numbering
    # encoder: symbolTT[s] = (deltaNbBits, deltaFindState); stateTable maps
    # "cumul rank" -> state+size
    state_table = [0]*size
    spread_pos = [i for i in range(size)]
    # per reference FSE_buildCTable: uses the same spread, then:
    cum = cumul[:]
    nxt = [0]*size
    for st in range(size):
        s = table[st]
        nxt[cum[s]] = size + st
        cum[s] += 1
    symbol_tt = []
    total = 0
    for s, f in enumerate(freq):
        if f == 0:
            symbol_tt.append((0, 0))
            continue
        if f == 1:
            delta_nb = ((tablelog) << 16) - (1 << tablelog)
            delta_fs = total - 1
        else:
            import math
            max_bits_out = tablelog - (f - 1).bit_length()
            min_state_plus = f << max_bits_out
            delta_nb = (max_bits_out << 16) - min_state_plus
            delta_fs = total - f
        symbol_tt.append((delta_nb, delta_fs))
        total += f
    return nxt, symbol_tt, cumul

class FSEEncoder:
    """Mirrors FSE_encodeSymbol/initCState semantics."""
    def __init__(self, dist, tablelog):
        self.nxt, self.tt, _ = fse_build_encode(dist, tablelog)
        self.log = tablelog
        self.state = None
    def init_state(self, sym):
        dnb, dfs = self.tt[sym]
        nbout = (dnb + (1 << 15)) >> 16
        self.state = self.nxt[(((nbout << 16) - dnb) >> nbout) + dfs]
    def encode(self, bw, sym):
        dnb, dfs = self.tt[sym]
        nbits = (self.state + dnb) >> 16
        bw.add(self.state & ((1 << nbits) - 1), nbits)
        self.state = self.nxt[(self.state >> nbits) + dfs]
    def flush(self, bw):
        bw.add(self.state - (1 << self.log), self.log)

def ll_code(ll):
    if ll < 16: return ll
    import math
    lg = ll.bit_length() - 1
    if ll <= 17: return 16
    for c in range(35, 15, -1):
        if ll >= LL_BASE[c]: return c
    return 16

def ml_code(ml):
    v = ml
    for c in range(52, -1, -1):
        if v >= ML_BASE[c]: return c
    raise ValueError

def encode_block_sequences(seqs):
    """seqs = [(ll, ml, offset)]: returns sequences section bytes."""
    out = bytearray()
    n = len(seqs)
    if n < 128:
        out.append(n)
    elif n < 0x7F00:
        out.append((n >> 8) + 0x80)
        out.append(n & 0xFF)
    else:
        out.append(0xFF)
        out += struct.pack("<H", n - 0x7F00)
    if n == 0:
        return bytes(out)
    out.append((0 << 6) | (0 << 4) | (0 << 2))  # predefined modes LL/OF/ML
    llE = FSEEncoder(LL_DEFAULT, LL_LOG)
    ofE = FSEEncoder(OF_DEFAULT, OF_LOG)
    mlE = FSEEncoder(ML_DEFAULT, ML_LOG)
    codes = []
    for (ll, ml, off) in seqs:
        ov = off + 3
        ofc = ov.bit_length() - 1
        llc = ll_code(ll)
        mlc = ml_code(ml)
        codes.append((llc, ll - LL_BASE[llc], LL_BITS[llc],
                      mlc, ml - ML_BASE[mlc], ML_BITS[mlc],
                      ofc, ov - (1 << ofc), ofc))
    bw = BitWriter()
    # init states from the LAST sequence (encoded first... RFC: decoder reads
    # states first, then sequences forward; encoder: init on last, encode
    # backwards, flush states at the end)
    llc, llx, llb, mlc, mlx, mlb, ofc, ofx, ofb = codes[-1]
    llE.init_state(llc); ofE.init_state(ofc); mlE.init_state(mlc)
    bw.add(llx, llb); bw.add(mlx, mlb); bw.add(ofx, ofb)
    for i in range(n - 2, -1, -1):
        llc, llx, llb, mlc, mlx, mlb, ofc, ofx, ofb = codes[i]
        ofE.encode(bw, ofc); mlE.encode(bw, mlc); llE.encode(bw, llc)
        bw.add(llx, llb); bw.add(mlx, mlb); bw.add(ofx, ofb)
    mlE.flush(bw); ofE.flush(bw); llE.flush(bw)
    out += bw.close()
    return bytes(out)

def encode_frame(data, seqs, literals):
    """One zstd frame: single block, raw literals + sequences."""
    lit = literals
    # literals section: raw, size_format 00/01/11 by size
    L = len(lit)
    if L < 32:
        lit_hdr = bytes([(L << 3) | 0])
    elif L < 4096:
        lit_hdr = bytes([((L & 15) << 4) | (1 << 2) | 0, L >> 4])
    else:
        lit_hdr = bytes([((L & 3) << 6) | (3 << 2) | 0,
                         (L >> 2) & 0xFF, L >> 10])
    seq_bytes = encode_block_sequences(seqs)
    block = lit_hdr + lit + seq_bytes
    bh = (len(block) << 3) | (2 << 1) | 1   # compressed, last
    out = struct.pack("<I", 0xFD2FB528)
    # frame header: single segment, FCS 1 byte if < 256
    n = len(data)
    if n < 256:
        out += bytes([0x20, n])          # descriptor: single_segment, FCS0
    else:
        out += bytes([0x60]) + struct.pack("<H", n - 256)
    out += struct.pack("<I", bh)[:3]
    out += block
    return out

# ------------- test: "hello hello hello!" with one match ---------------------
data = b"abcdefgh_abcdefgh_abcdefgh_XYZ"
# one sequence: literals "abcdefgh_", match ml=18 off=9, then tail "XYZ"
# zstd block: sequences consume literals; tail literals = last_literals
seqs = [(9, 18, 9)]
literals = b"abcdefgh_" + b"XYZ"
frame = encode_frame(data, seqs, literals)
try:
    out = zstandard.ZstdDecompressor().decompress(frame, max_output_size=100)
    print("decoded:", out)
    print("MATCH" if out == data else "MISMATCH")
except Exception as e:
    print("decode failed:", e)

# no-sequence frame (pure literals)
frame2 = encode_frame(b"plain", [], b"plain")
try:
    out = zstandard.ZstdDecompressor().decompress(frame2, max_output_size=100)
    print("plain:", out, "MATCH" if out == b"plain" else "MISMATCH")
except Exception as e:
    print("plain decode failed:", e)

# debug zero-seq: compare against a real zstd tiny frame
real = zstandard.ZstdCompressor(level=1).compress(b"plain")
print("real frame:", real.hex())
print("ours:     ", frame2.hex())
