"""Pure-Python Zstandard (RFC 8878) — decoder + fixture-grade encoder
for in-kernel shard decompression.

Why it exists: `.zst` is the wire format of the big public LLM corpora
(Dolma, RedPajama, SlimPajama, recent CC derivatives ship
jsonl.zst / tar.zst shards). Spark's JVM codec handles whole *files*
(spark.read.json over .jsonl.zst works out of the box — pinned in
tests), but a payload COLUMN of zst-compressed shard members (a
.tar.zst WebDataset shard, a zst member in a composite container)
must decompress inside the Arrow kernel, and Python 3.11 has no
stdlib zstd. This module is that executor-side path — stdlib-free,
allocation bounded inside the decode loop (the r5 FLAC lesson), and
wire-pinned BOTH directions against the system libzstd 1.5.4 via
ctypes in tests/test_zstd_codec.py (the in-container reference —
the GIF-LZW lesson: a self-consistent round trip proves nothing).

Decoder scope: full RFC 8878 frame/block layer — raw, RLE and
compressed blocks; raw/RLE/Huffman literals (single- and four-stream,
direct and FSE-compressed weight descriptions, treeless repeats);
sequences under all four symbol-compression modes (predefined, RLE,
FSE-described, repeat) with the complete repeated-offset state
machine; skippable frames; multi-frame concatenation. Dictionaries
are rejected (dictionary_id != 0 raises); content checksums are
length-validated and skipped (xxh64 verification is not required for
correctness of the decode).

Encoder scope (fixtures): store mode (raw blocks + RLE collapse) and
a real compressed-block mode — raw literals plus a greedy hash-chain
LZ77 matcher whose sequences are FSE-coded with the RFC's PREDEFINED
distributions (so the graded fixtures exercise the sequence machine,
interleaved-state FSE bitstream and repeat-offset logic for real).
libzstd decodes both forms bit-exactly (pinned in tests).

Reference-repo analog: none (raw blobs only, src/common/lake.py:59-71);
this sits in the north-star sources tier beside warc/webdataset.
"""

from __future__ import annotations

import struct

__all__ = ["zstd_decompress", "zstd_compress_store", "zstd_compress"]

_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50

# ---------------------------------------------------------------------------
# RFC 8878 §3.1.1.3.2.1.1 predefined FSE distributions + code tables.
# The three default distributions are BINARY-EXTRACTED from the system
# libzstd.so.1 (int16 arrays at offsets 684128/684192/684544 — four
# identical copies each), re-proving the arithmetic-table lesson: the
# first two memory transcriptions of ML_defaultNorm both mis-placed the
# less-than-one tail (at 42 then 36; the reference says 46) and decoded
# plausible-but-wrong match lengths. Re-extraction is pinned in
# tests/test_zstd_codec.py.

_LL_DEFAULT = (
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1,
)  # accuracy_log 6
_ML_DEFAULT = (
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1,
)  # accuracy_log 6
_OF_DEFAULT = (
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, -1, -1, -1, -1, -1,
)  # accuracy_log 5

# literals-length codes: (baseline, nbits) per code 0..35
_LL_BASE = tuple(range(16)) + (
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
)
_LL_BITS = (0,) * 16 + (1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
# match-length codes: (baseline, nbits) per code 0..52
_ML_BASE = tuple(range(3, 35)) + (
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
)
_ML_BITS = (0,) * 32 + (1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

_MAX_OUT_DEFAULT = 1 << 27  # 128 MiB — the shard-member ceiling


def _highbit(v: int) -> int:
    return v.bit_length() - 1


# ---------------------------------------------------------------------------
# backward bitstream (§3.1.1.1: streams are read from the last byte,
# after a 1-bit end marker)


class _BackBits:
    __slots__ = ("acc", "nbits")

    def __init__(self, data: bytes) -> None:
        if not data:
            raise ValueError("zstd: empty bitstream")
        acc = int.from_bytes(data, "little")
        if acc == 0:
            raise ValueError("zstd: bitstream missing end marker")
        self.acc = acc
        self.nbits = acc.bit_length() - 1  # strip the marker bit

    def read(self, n: int) -> int:
        """Take the next n bits (MSB side of what remains)."""
        if n == 0:
            return 0
        if n > self.nbits:
            # §3.1.1.1: states may legally consume past the start by
            # zero-padding (FSE init never does; sequence reads can on
            # the final update) — pad with zeros
            pad = n - self.nbits
            v = (self.acc & ((1 << self.nbits) - 1)) << pad
            self.nbits = 0
            return v
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def exhausted(self) -> bool:
        return self.nbits == 0


# ---------------------------------------------------------------------------
# FSE table build + decode (§4.1)


def _fse_build(probs, accuracy_log: int):
    """Normalized counts (−1 = less-than-one) → decode table:
    (symbol, nbits, newstate_base) per cell."""
    size = 1 << accuracy_log
    sym = [0] * size
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:
            sym[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            sym[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: corrupt FSE distribution")
    nxt = [1 if p == -1 else p for p in probs]
    nbits = [0] * size
    base = [0] * size
    for i in range(size):
        s = sym[i]
        x = nxt[s]
        nxt[s] = x + 1
        nb = accuracy_log - _highbit(x)
        nbits[i] = nb
        base[i] = (x << nb) - size
    return sym, nbits, base


def _fse_read_distribution(data: bytes, pos: int, max_symbols: int):
    """§4.1.1 FSE table description → (probs, accuracy_log, new pos)."""
    if pos >= len(data):
        raise ValueError("zstd: truncated FSE description")
    bitpos = 0

    def take(n: int) -> int:
        nonlocal pos, bitpos
        v = 0
        got = 0
        while got < n:
            if pos >= len(data):
                raise ValueError("zstd: truncated FSE description")
            avail = 8 - bitpos
            chunk = min(avail, n - got)
            v |= ((data[pos] >> bitpos) & ((1 << chunk) - 1)) << got
            got += chunk
            bitpos += chunk
            if bitpos == 8:
                bitpos = 0
                pos += 1
        return v

    al = take(4) + 5
    if al > 9:
        raise ValueError("zstd: FSE accuracy log too large")
    remaining = (1 << al) + 1
    probs: list[int] = []
    while remaining > 1:
        if len(probs) > max_symbols:
            raise ValueError("zstd: too many FSE symbols")
        # threshold = largest power of two <= remaining; values below
        # `mx` fit in nbits-1 bits, the rest take the full nbits and
        # fold the small-value range back out (FSE_readNCount)
        nbits = _highbit(remaining) + 1
        threshold = 1 << (nbits - 1)
        mx = (2 * threshold - 1) - remaining
        v = take(nbits - 1)
        if v >= mx:
            v |= take(1) << (nbits - 1)
            if v >= threshold:
                v -= mx
        prob = v - 1
        probs.append(prob)
        remaining -= abs(prob) if prob != 0 else 0
        if prob == 0:
            # 2-bit repeat flags: number of additional zero probs
            while True:
                rep = take(2)
                probs.extend([0] * rep)
                if rep != 3:
                    break
        if remaining < 1:
            raise ValueError("zstd: corrupt FSE distribution")
    if bitpos:
        pos += 1
    if len(probs) > max_symbols + 1:
        raise ValueError("zstd: too many FSE symbols")
    return probs, al, pos


# ---------------------------------------------------------------------------
# Huffman literals (§4.2)


def _huff_from_weights(weights: list[int]):
    """Weights (last one implicit) → (max_bits, decode dict
    {(code, length): symbol} flattened into a fast lookup table)."""
    total = sum((1 << (w - 1)) for w in weights if w)
    if total == 0:
        raise ValueError("zstd: empty huffman table")
    # the implicit last weight completes the sum to the next power of 2
    max_bits = _highbit(total) + 1
    if max_bits > 11:
        raise ValueError("zstd: huffman code length over 11")
    left = (1 << max_bits) - total
    if left <= 0 or left & (left - 1):
        raise ValueError("zstd: corrupt huffman weights")
    last_w = _highbit(left) + 1
    weights = weights + [last_w]
    # number_of_bits = max_bits + 1 - weight (weight 0 = absent)
    lens = [0 if w == 0 else max_bits + 1 - w for w in weights]
    # canonical: lower weights (longer codes) first, symbol order inside
    table = [0] * (1 << max_bits)
    lengths = [0] * (1 << max_bits)
    code = 0
    for w in range(1, max_bits + 1):  # weight ascending = length descending
        ln = max_bits + 1 - w
        for s, ws in enumerate(weights):
            if ws != w:
                continue
            span = 1 << (max_bits - ln)
            base = code
            for i in range(span):
                table[base + i] = s
                lengths[base + i] = ln
            code += span
    if code != (1 << max_bits):
        raise ValueError("zstd: corrupt huffman table")
    return max_bits, table, lengths


def _huff_read_description(data: bytes, pos: int):
    """§4.2.1 → (huff_table, new pos)."""
    if pos >= len(data):
        raise ValueError("zstd: truncated huffman description")
    hdr = data[pos]
    pos += 1
    if hdr >= 128:
        n = hdr - 127
        nbytes = (n + 1) // 2
        if pos + nbytes > len(data):
            raise ValueError("zstd: truncated huffman weights")
        weights = []
        for i in range(n):
            b = data[pos + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 15))
        pos += nbytes
    else:
        size = hdr
        if pos + size > len(data):
            raise ValueError("zstd: truncated huffman FSE weights")
        probs, al, desc_end = _fse_read_distribution(data[pos : pos + size], 0, 255)
        if al > 6:
            raise ValueError("zstd: huffman weight accuracy log too large")
        sym, nbits, base = _fse_build(probs, al)
        # the remaining bytes after the table description are the
        # backward weight bitstream
        bs = _BackBits(data[pos + desc_end : pos + size])
        # two interleaved states (§4.2.1.3): each emits then updates;
        # when an update needs more bits than remain (zero-padded),
        # the OTHER state emits once more and decoding stops
        s1 = bs.read(al)
        s2 = bs.read(al)
        weights = []
        while True:
            weights.append(sym[s1])
            over = nbits[s1] > bs.nbits
            s1 = base[s1] + bs.read(nbits[s1])
            if over:
                weights.append(sym[s2])
                break
            weights.append(sym[s2])
            over = nbits[s2] > bs.nbits
            s2 = base[s2] + bs.read(nbits[s2])
            if over:
                weights.append(sym[s1])
                break
            if len(weights) > 254:
                raise ValueError("zstd: huffman weights overflow")
        pos += size
    if len(weights) > 255:
        raise ValueError("zstd: too many huffman weights")
    return _huff_from_weights([w for w in weights]), pos


def _huff_decode_stream(data: bytes, huff, n_out: int) -> bytes:
    """Decode exactly n_out symbols from one backward Huffman stream.
    Lookahead may run past the stream start zero-padded (the reference
    decoder's BIT_lookBits semantics), but the stream must be consumed
    EXACTLY by the end (BIT_endOfDStream) — anything else is corrupt."""
    max_bits, table, lengths = huff
    bs = _BackBits(data)
    out = bytearray()
    mask = (1 << max_bits) - 1
    acc = bs.acc
    nbits = bs.nbits
    for _ in range(n_out):
        if nbits >= max_bits:
            idx = (acc >> (nbits - max_bits)) & mask
        elif nbits > 0:
            idx = (acc << (max_bits - nbits)) & mask
        else:
            raise ValueError("zstd: huffman stream exhausted")
        ln = lengths[idx]
        if ln == 0:
            raise ValueError("zstd: corrupt huffman stream")
        nbits -= ln  # the final code may land exactly on zero
        out.append(table[idx])
    if nbits != 0:
        raise ValueError("zstd: huffman stream not exactly consumed")
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder core


def _decode_literals(data: bytes, pos: int, prev_huff, max_out: int):
    """§3.1.1.3.1 → (literals bytes, new pos, huff table for reuse)."""
    if pos >= len(data):
        raise ValueError("zstd: truncated literals header")
    b0 = data[pos]
    lit_type = b0 & 3
    size_fmt = (b0 >> 2) & 3
    if lit_type in (0, 1):  # raw / RLE
        if size_fmt in (0, 2):
            rsize = b0 >> 3
            pos += 1
        elif size_fmt == 1:
            if pos + 2 > len(data):
                raise ValueError("zstd: truncated literals header")
            rsize = (b0 >> 4) | (data[pos + 1] << 4)
            pos += 2
        else:
            if pos + 3 > len(data):
                raise ValueError("zstd: truncated literals header")
            rsize = (b0 >> 4) | (data[pos + 1] << 4) | (data[pos + 2] << 12)
            pos += 3
        if rsize > max_out:
            raise ValueError("zstd: literals exceed output bound")
        if lit_type == 0:
            if pos + rsize > len(data):
                raise ValueError("zstd: truncated raw literals")
            return data[pos : pos + rsize], pos + rsize, prev_huff
        if pos + 1 > len(data):
            raise ValueError("zstd: truncated RLE literal")
        return bytes([data[pos]]) * rsize, pos + 1, prev_huff
    # compressed (2) or treeless (3)
    if size_fmt == 0:
        streams = 1
        if pos + 3 > len(data):
            raise ValueError("zstd: truncated literals header")
        v = b0 >> 4 | data[pos + 1] << 4 | data[pos + 2] << 12
        rsize = v & 0x3FF
        csize = v >> 10
        pos += 3
    elif size_fmt == 1:
        streams = 4
        if pos + 3 > len(data):
            raise ValueError("zstd: truncated literals header")
        v = b0 >> 4 | data[pos + 1] << 4 | data[pos + 2] << 12
        rsize = v & 0x3FF
        csize = v >> 10
        pos += 3
    elif size_fmt == 2:
        streams = 4
        if pos + 4 > len(data):
            raise ValueError("zstd: truncated literals header")
        v = b0 >> 4 | data[pos + 1] << 4 | data[pos + 2] << 12 | data[pos + 3] << 20
        rsize = v & 0x3FFF
        csize = v >> 14
        pos += 4
    else:
        streams = 4
        if pos + 5 > len(data):
            raise ValueError("zstd: truncated literals header")
        v = (b0 >> 4 | data[pos + 1] << 4 | data[pos + 2] << 12
             | data[pos + 3] << 20 | data[pos + 4] << 28)
        rsize = v & 0x3FFFF
        csize = v >> 18
        pos += 5
    if rsize > max_out:
        raise ValueError("zstd: literals exceed output bound")
    if pos + csize > len(data):
        raise ValueError("zstd: truncated compressed literals")
    section = data[pos : pos + csize]
    pos += csize
    spos = 0
    if lit_type == 2:
        huff, spos = _huff_read_description(section, 0)
    else:
        if prev_huff is None:
            raise ValueError("zstd: treeless literals without a previous table")
        huff = prev_huff
    if streams == 1:
        lit = _huff_decode_stream(section[spos:], huff, rsize)
    else:
        if spos + 6 > len(section):
            raise ValueError("zstd: truncated stream jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", section, spos)
        spos += 6
        body = section[spos:]
        if s1 + s2 + s3 > len(body):
            raise ValueError("zstd: corrupt stream jump table")
        per = (rsize + 3) // 4
        parts = []
        offs = (0, s1, s1 + s2, s1 + s2 + s3)
        sizes = (s1, s2, s3, len(body) - s1 - s2 - s3)
        for i in range(4):
            n = per if i < 3 else rsize - 3 * per
            if n < 0:
                raise ValueError("zstd: corrupt four-stream literals")
            parts.append(
                _huff_decode_stream(body[offs[i] : offs[i] + sizes[i]], huff, n)
            )
        lit = b"".join(parts)
    return lit, pos, huff


def _seq_table(mode: int, data: bytes, pos: int, default, al_default: int,
               max_sym: int, prev, what: str):
    """Resolve one of LL/OF/ML decode tables per the 2-bit mode."""
    if mode == 0:
        return _fse_build(default, al_default), pos, None
    if mode == 1:
        if pos >= len(data):
            raise ValueError(f"zstd: truncated {what} RLE byte")
        s = data[pos]
        if s > max_sym:
            raise ValueError(f"zstd: {what} RLE symbol out of range")
        return ((s,), (0,), (0,)), pos + 1, None
    if mode == 2:
        probs, al, pos = _fse_read_distribution(data, pos, max_sym)
        return _fse_build(probs, al), pos, None
    if prev is None:
        raise ValueError(f"zstd: {what} repeat mode without a previous table")
    return prev, pos, None


def _decode_block(data: bytes, out: bytearray, state: dict, max_out: int) -> None:
    """One compressed block body → append to out (§3.1.1.3)."""
    lit, pos, huff = _decode_literals(data, 0, state.get("huff"), max_out)
    state["huff"] = huff
    # --- sequences header
    if pos >= len(data):
        raise ValueError("zstd: truncated sequences header")
    b0 = data[pos]
    pos += 1
    if b0 == 0:
        if len(out) + len(lit) > max_out:
            raise ValueError("zstd: output exceeds bound")
        out.extend(lit)
        return
    if b0 < 128:
        n_seq = b0
    elif b0 < 255:
        if pos >= len(data):
            raise ValueError("zstd: truncated sequences header")
        n_seq = ((b0 - 128) << 8) | data[pos]
        pos += 1
    else:
        if pos + 2 > len(data):
            raise ValueError("zstd: truncated sequences header")
        n_seq = struct.unpack_from("<H", data, pos)[0] + 0x7F00
        pos += 2
    if pos >= len(data):
        raise ValueError("zstd: truncated compression modes")
    modes = data[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence mode bits set")
    ll_tab, pos, _ = _seq_table((modes >> 6) & 3, data, pos, _LL_DEFAULT, 6, 35,
                                state.get("ll"), "literals-length")
    of_tab, pos, _ = _seq_table((modes >> 4) & 3, data, pos, _OF_DEFAULT, 5, 31,
                                state.get("of"), "offset")
    ml_tab, pos, _ = _seq_table((modes >> 2) & 3, data, pos, _ML_DEFAULT, 6, 52,
                                state.get("ml"), "match-length")
    state["ll"], state["of"], state["ml"] = ll_tab, of_tab, ml_tab

    bs = _BackBits(data[pos:])
    ll_sym, ll_nb, ll_base = ll_tab
    of_sym, of_nb, of_base = of_tab
    ml_sym, ml_nb, ml_base = ml_tab
    ll_state = bs.read(_highbit(len(ll_sym))) if len(ll_sym) > 1 else 0
    of_state = bs.read(_highbit(len(of_sym))) if len(of_sym) > 1 else 0
    ml_state = bs.read(_highbit(len(ml_sym))) if len(ml_sym) > 1 else 0
    reps = state["reps"]
    lit_pos = 0
    for i in range(n_seq):
        of_code = of_sym[of_state]
        ml_code = ml_sym[ml_state]
        ll_code = ll_sym[ll_state]
        if of_code > 31 or ml_code > 52 or ll_code > 35:
            raise ValueError("zstd: sequence code out of range")
        # field bits read OF -> ML -> LL
        of_val = (1 << of_code) + bs.read(of_code)
        ml = _ML_BASE[ml_code] + bs.read(_ML_BITS[ml_code])
        ll = _LL_BASE[ll_code] + bs.read(_LL_BITS[ll_code])
        # repeated offsets (§3.1.1.5): values 1-3 address the repeat
        # history, shifted by one when literals_length == 0 (rep1 with
        # ll == 0 would repeat the previous sequence verbatim, so the
        # encoder can never need it and the decoder re-purposes it)
        if of_val > 3:
            offset = of_val - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = of_val - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 2:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # idx == 3: rep1 - 1
                offset = reps[0] - 1
                if offset <= 0:
                    raise ValueError("zstd: zero repeat offset")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if offset <= 0:
            raise ValueError("zstd: bad offset")
        # copy literals
        if lit_pos + ll > len(lit):
            raise ValueError("zstd: literal run exceeds literals")
        if len(out) + ll + ml > max_out:
            raise ValueError("zstd: output exceeds bound")
        out.extend(lit[lit_pos : lit_pos + ll])
        lit_pos += ll
        # copy match (possibly overlapping)
        if offset > len(out):
            raise ValueError("zstd: match offset beyond window")
        start = len(out) - offset
        for k in range(ml):
            out.append(out[start + k])
        # state updates (not after the last sequence): LL, ML, OF
        if i < n_seq - 1:
            ll_state = ll_base[ll_state] + bs.read(ll_nb[ll_state])
            ml_state = ml_base[ml_state] + bs.read(ml_nb[ml_state])
            of_state = of_base[of_state] + bs.read(of_nb[of_state])
    # trailing literals
    rest = len(lit) - lit_pos
    if len(out) + rest > max_out:
        raise ValueError("zstd: output exceeds bound")
    out.extend(lit[lit_pos:])


def zstd_decompress(data: bytes, *, max_out: int = _MAX_OUT_DEFAULT) -> bytes:
    """Decode a complete zstd payload (multi-frame, skippable frames
    allowed) → bytes. Raises ValueError on anything malformed; output
    growth is bounded INSIDE every copy against `max_out`."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("zstd: truncated magic")
        magic = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if (magic & 0xFFFFFFF0) == _SKIPPABLE_LO:
            if pos + 4 > n:
                raise ValueError("zstd: truncated skippable frame")
            sz = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            if pos + sz > n:
                raise ValueError("zstd: truncated skippable frame body")
            pos += sz
            continue
        if magic != _MAGIC:
            raise ValueError("zstd: bad magic")
        if pos >= n:
            raise ValueError("zstd: truncated frame header")
        fhd = data[pos]
        pos += 1
        if fhd & 8:
            raise ValueError("zstd: reserved frame header bit set")
        single = (fhd >> 5) & 1
        fcs_flag = fhd >> 6
        did_flag = fhd & 3
        if not single:
            if pos >= n:
                raise ValueError("zstd: truncated window descriptor")
            pos += 1  # window descriptor (we bound by max_out instead)
        did_len = (0, 1, 2, 4)[did_flag]
        if did_len:
            if pos + did_len > n:
                raise ValueError("zstd: truncated dictionary id")
            did = int.from_bytes(data[pos : pos + did_len], "little")
            if did != 0:
                raise ValueError("zstd: dictionaries not supported")
            pos += did_len
        fcs_len = (1 if single else 0, 2, 4, 8)[fcs_flag]
        fcs = None
        if fcs_len:
            if pos + fcs_len > n:
                raise ValueError("zstd: truncated content size")
            fcs = int.from_bytes(data[pos : pos + fcs_len], "little")
            if fcs_len == 2:
                fcs += 256
            pos += fcs_len
            if fcs > max_out:
                raise ValueError("zstd: declared content exceeds output bound")
        has_checksum = (fhd >> 2) & 1
        frame_start = len(out)
        state = {"reps": [1, 4, 8], "huff": None, "ll": None, "of": None, "ml": None}
        while True:
            if pos + 3 > n:
                raise ValueError("zstd: truncated block header")
            bh = data[pos] | data[pos + 1] << 8 | data[pos + 2] << 16
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:  # raw
                if pos + bsize > n:
                    raise ValueError("zstd: truncated raw block")
                if len(out) + bsize > max_out:
                    raise ValueError("zstd: output exceeds bound")
                out.extend(data[pos : pos + bsize])
                pos += bsize
            elif btype == 1:  # RLE
                if pos >= n:
                    raise ValueError("zstd: truncated RLE block")
                if len(out) + bsize > max_out:
                    raise ValueError("zstd: output exceeds bound")
                out.extend(bytes([data[pos]]) * bsize)
                pos += 1
            elif btype == 2:
                if pos + bsize > n:
                    raise ValueError("zstd: truncated compressed block")
                _decode_block(data[pos : pos + bsize], out, state, max_out)
                pos += bsize
            else:
                raise ValueError("zstd: reserved block type")
            if last:
                break
        if fcs is not None and len(out) - frame_start != fcs:
            raise ValueError("zstd: content size mismatch")
        if has_checksum:
            if pos + 4 > n:
                raise ValueError("zstd: truncated checksum")
            pos += 4  # xxh64 low-32 — length-validated, not recomputed
    return bytes(out)


# ---------------------------------------------------------------------------
# Fixture encoders. Store mode emits raw/RLE blocks; compressed mode
# runs a greedy hash matcher and FSE-codes the sequences with the
# PREDEFINED distributions (mode 0), so decoding fixtures exercises
# the real sequence machine. libzstd decodes both (pinned in tests).

_BLOCK_MAX = 128 * 1024


def _frame_header(content_size: int) -> bytes:
    """Single-segment frame header with explicit content size."""
    if content_size < 256:
        return bytes([0x20, content_size])
    if content_size < 65536 + 256:
        return b"\x60" + struct.pack("<H", content_size - 256)
    return b"\xA0" + struct.pack("<I", content_size)


def zstd_compress_store(data: bytes) -> bytes:
    """Conformant zstd with zero modeling: RLE blocks for repeated-byte
    runs that fill a whole block, raw blocks otherwise."""
    out = bytearray(struct.pack("<I", _MAGIC))
    out += _frame_header(len(data))
    if not data:
        out += b"\x01\x00\x00"  # last empty raw block
        return bytes(out)
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + _BLOCK_MAX]
        pos += len(chunk)
        last = 1 if pos >= len(data) else 0
        if len(chunk) > 1 and chunk.count(chunk[0]) == len(chunk):
            bh = last | (1 << 1) | (len(chunk) << 3)
            out += struct.pack("<I", bh)[:3] + chunk[:1]
        else:
            bh = last | (0 << 1) | (len(chunk) << 3)
            out += struct.pack("<I", bh)[:3] + chunk
    return bytes(out)


def _fse_encode_intervals(probs, al: int):
    """Decode-table inversion for encoding: per symbol, the sorted
    (base, nbits, state) cells — for any successor state t there is
    exactly one cell of the symbol with t in [base, base + 2^nbits)."""
    sym, nbits, base = _fse_build(probs, al)
    per: dict[int, list[tuple[int, int, int]]] = {}
    for st in range(len(sym)):
        per.setdefault(sym[st], []).append((base[st], nbits[st], st))
    for v in per.values():
        v.sort()
    return per


def _fse_pick(per, symbol: int, target: int):
    """The unique cell of `symbol` whose successor interval contains
    `target` → (state, nbits, bits_value)."""
    cells = per[symbol]
    lo, hi = 0, len(cells) - 1
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if cells[mid][0] <= target:
            lo = mid
        else:
            hi = mid - 1
    b, nb, st = cells[lo]
    if not (b <= target < b + (1 << nb)):
        raise AssertionError("zstd: FSE interval inversion broken")
    return st, nb, target - b


def _pack_backward(bits: list[tuple[int, int]]) -> bytes:
    """(value, nbits) pairs in DECODE order → backward bitstream bytes
    (1-bit end marker + zero pad, little-endian packing)."""
    acc = 1  # marker
    total = 0
    for v, n in bits:
        acc = (acc << n) | v
        total += n
    nbytes = (total + 1 + 7) // 8
    return acc.to_bytes(nbytes, "little")


def _ll_code(ll: int) -> int:
    if ll < 16:
        return ll
    c = 35
    while _LL_BASE[c] > ll:
        c -= 1
    return c


def _ml_code(ml: int) -> int:
    if ml < 35:
        return ml - 3
    c = 52
    while _ML_BASE[c] > ml:
        c -= 1
    return c


def _encode_block_sequences(
    chunk: bytes, abs_start: int, data: bytes, table: dict
) -> bytes:
    """One compressed block body for chunk = data[abs_start:...]:
    raw literals + greedy hash-chain matches, predefined-FSE coded.
    `table` is the per-frame hash table (threaded explicitly so
    concurrent encodes never share state)."""
    # --- greedy matcher (4-byte hash, most-recent position)
    seqs: list[tuple[int, int, int]] = []  # (ll, offset, ml)
    lits = bytearray()
    n = len(chunk)
    i = 0
    run_start = 0
    while i + 4 <= n:
        apos = abs_start + i
        key = data[apos : apos + 4]
        cand = table.get(key, -1)
        table[key] = apos
        if cand >= 0 and apos - cand <= (1 << 21):
            # verify + extend
            ml = 0
            limit = n - i
            while ml < limit and data[cand + ml] == chunk[i + ml]:
                ml += 1
                if ml >= 131074:
                    break
            if ml >= 4:
                lits += chunk[run_start:i]
                seqs.append((i - run_start, apos - cand, ml))
                # index a few positions inside the match so later
                # repeats still find them
                for j in range(i + 1, min(i + ml, n - 4), 37):
                    table[data[abs_start + j : abs_start + j + 4]] = abs_start + j
                i += ml
                run_start = i
                continue
        i += 1
    lits += chunk[run_start:]

    # --- literals section (raw)
    rsize = len(lits)
    if rsize < 32:
        lit_hdr = bytes([(rsize << 3) | 0])
    elif rsize < 4096:
        lit_hdr = bytes([((rsize & 15) << 4) | (1 << 2) | 0, rsize >> 4])
    else:
        lit_hdr = bytes([((rsize & 15) << 4) | (3 << 2) | 0,
                         (rsize >> 4) & 255, rsize >> 12])
    body = bytearray(lit_hdr + lits)

    # --- sequences section
    n_seq = len(seqs)
    if n_seq == 0:
        body.append(0)
        return bytes(body)
    if n_seq < 128:
        body.append(n_seq)
    elif n_seq < 0x7F00:
        body += bytes([(n_seq >> 8) + 128, n_seq & 255])
    else:
        body += b"\xff" + struct.pack("<H", n_seq - 0x7F00)
    body.append(0)  # all three tables predefined (mode 0)

    ll_per = _fse_encode_intervals(_LL_DEFAULT, 6)
    of_per = _fse_encode_intervals(_OF_DEFAULT, 5)
    ml_per = _fse_encode_intervals(_ML_DEFAULT, 6)
    codes = []
    for ll, offset, ml in seqs:
        of_val = offset + 3
        codes.append((_ll_code(ll), _highbit(of_val), _ml_code(ml)))
    # choose state chains in reverse (the FSE encoding recurrence)
    ll_states = [0] * n_seq
    of_states = [0] * n_seq
    ml_states = [0] * n_seq
    ll_bits = [(0, 0)] * (n_seq - 1)
    ml_bits = [(0, 0)] * (n_seq - 1)
    of_bits = [(0, 0)] * (n_seq - 1)
    for k in range(n_seq - 1, -1, -1):
        llc, ofc, mlc = codes[k]
        if k == n_seq - 1:
            ll_states[k] = ll_per[llc][0][2]
            of_states[k] = of_per[ofc][0][2]
            ml_states[k] = ml_per[mlc][0][2]
        else:
            st, nb, v = _fse_pick(ll_per, llc, ll_states[k + 1])
            ll_states[k] = st
            ll_bits[k] = (v, nb)
            st, nb, v = _fse_pick(ml_per, mlc, ml_states[k + 1])
            ml_states[k] = st
            ml_bits[k] = (v, nb)
            st, nb, v = _fse_pick(of_per, ofc, of_states[k + 1])
            of_states[k] = st
            of_bits[k] = (v, nb)
    # emit in DECODE order
    bits: list[tuple[int, int]] = [
        (ll_states[0], 6), (of_states[0], 5), (ml_states[0], 6)
    ]
    for k in range(n_seq):
        ll, offset, ml = seqs[k]
        llc, ofc, mlc = codes[k]
        of_val = offset + 3
        bits.append((of_val - (1 << ofc), ofc))
        bits.append((ml - _ML_BASE[mlc], _ML_BITS[mlc]))
        bits.append((ll - _LL_BASE[llc], _LL_BITS[llc]))
        if k < n_seq - 1:
            bits.append(ll_bits[k])
            bits.append(ml_bits[k])
            bits.append(of_bits[k])
    body += _pack_backward(bits)
    return bytes(body)


def zstd_compress(data: bytes) -> bytes:
    """Greedy-matched, predefined-FSE zstd frame (raw literals). Real
    compression on repetitive shard content; always conformant."""
    out = bytearray(struct.pack("<I", _MAGIC))
    out += _frame_header(len(data))
    if not data:
        out += b"\x01\x00\x00"
        return bytes(out)
    table: dict = {}
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + _BLOCK_MAX]
        last = 1 if pos + len(chunk) >= len(data) else 0
        body = _encode_block_sequences(chunk, pos, data, table)
        if len(body) >= len(chunk):
            bh = last | (0 << 1) | (len(chunk) << 3)
            out += struct.pack("<I", bh)[:3] + chunk
        else:
            bh = last | (2 << 1) | (len(body) << 3)
            out += struct.pack("<I", bh)[:3] + body
        pos += len(chunk)
    return bytes(out)
