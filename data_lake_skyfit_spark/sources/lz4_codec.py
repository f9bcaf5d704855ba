"""Pure-Python LZ4 (frame + block, lz4.github.io spec) — the third
in-kernel shard codec beside gzip (stdlib zlib) and zstd
(sources/zstd_codec). Wire-pinned both directions against the system
liblz4.so.1 via ctypes in tests/test_lz4_codec.py.

Decoder scope: the full frame format — FLG/BD descriptor (version 01,
independent or linked blocks, optional content size / dict id /
checksums), compressed and uncompressed blocks, EndMark, concatenated
and skippable frames. Checksums (xxh32) are length-validated and
skipped. Legacy frames (0x184C2102) are rejected. Block decode is the
token / literal-run / 16-bit-offset / match-run loop with
allocation bounded inside it.

Encoder scope (fixtures): a greedy hash matcher emitting conformant
blocks inside a minimal frame (content-size flagged) — liblz4
decompresses it bit-exactly (pinned in tests).
"""

from __future__ import annotations

import struct

__all__ = ["lz4_decompress", "lz4_compress"]

_MAGIC = 0x184D2204
_SKIPPABLE_LO = 0x184D2A50
_LEGACY = 0x184C2102
_MAX_OUT_DEFAULT = 1 << 27


def _decode_block(src: bytes, out: bytearray, max_out: int) -> None:
    pos = 0
    n = len(src)
    while True:
        if pos >= n:
            raise ValueError("lz4: truncated block (missing token)")
        token = src[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = src[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise ValueError("lz4: literal run exceeds block")
        if len(out) + lit > max_out:
            raise ValueError("lz4: output exceeds bound")
        out.extend(src[pos : pos + lit])
        pos += lit
        if pos == n:
            return  # final sequence is literals-only
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4: bad match offset")
        ml = (token & 15) + 4
        if (token & 15) == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = src[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        if len(out) + ml > max_out:
            raise ValueError("lz4: output exceeds bound")
        start = len(out) - offset
        for k in range(ml):
            out.append(out[start + k])


def lz4_decompress(data: bytes, *, max_out: int = _MAX_OUT_DEFAULT) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("lz4: truncated magic")
        magic = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if (magic & 0xFFFFFFF0) == _SKIPPABLE_LO:
            if pos + 4 > n:
                raise ValueError("lz4: truncated skippable frame")
            sz = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            if pos + sz > n:
                raise ValueError("lz4: truncated skippable body")
            pos += sz
            continue
        if magic == _LEGACY:
            raise ValueError("lz4: legacy frame not supported")
        if magic != _MAGIC:
            raise ValueError("lz4: bad magic")
        if pos + 2 > n:
            raise ValueError("lz4: truncated frame descriptor")
        flg, bd = data[pos], data[pos + 1]
        pos += 2
        if (flg >> 6) != 1:
            raise ValueError("lz4: unsupported frame version")
        if flg & 0x02 or bd & 0x8F:
            raise ValueError("lz4: reserved descriptor bits set")
        block_checksum = (flg >> 4) & 1
        has_csize = (flg >> 3) & 1
        has_ccheck = (flg >> 2) & 1
        has_dictid = flg & 1
        csize = None
        if has_csize:
            if pos + 8 > n:
                raise ValueError("lz4: truncated content size")
            csize = struct.unpack_from("<Q", data, pos)[0]
            pos += 8
            if csize > max_out:
                raise ValueError("lz4: declared content exceeds output bound")
        if has_dictid:
            raise ValueError("lz4: dictionaries not supported")
        pos += 1  # HC header-checksum byte (not recomputed)
        if pos > n:
            raise ValueError("lz4: truncated header checksum")
        frame_start = len(out)
        while True:
            if pos + 4 > n:
                raise ValueError("lz4: truncated block size")
            bsz = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            if bsz == 0:  # EndMark
                break
            uncompressed = bsz >> 31
            bsz &= 0x7FFFFFFF
            if pos + bsz > n:
                raise ValueError("lz4: truncated block")
            if uncompressed:
                if len(out) + bsz > max_out:
                    raise ValueError("lz4: output exceeds bound")
                out.extend(data[pos : pos + bsz])
            else:
                _decode_block(data[pos : pos + bsz], out, max_out)
            pos += bsz
            if block_checksum:
                if pos + 4 > n:
                    raise ValueError("lz4: truncated block checksum")
                pos += 4
        if has_ccheck:
            if pos + 4 > n:
                raise ValueError("lz4: truncated content checksum")
            pos += 4
        if csize is not None and len(out) - frame_start != csize:
            raise ValueError("lz4: content size mismatch")
    return bytes(out)


def lz4_compress(data: bytes) -> bytes:
    """Greedy-matched conformant LZ4 frame: 64 KiB max block size,
    content-size flagged, no block/content checksums; the mandatory
    header-checksum byte is the xxh32 of the descriptor (liblz4
    validates it on decode)."""
    out = bytearray(struct.pack("<I", _MAGIC))
    flg = (1 << 6) | (1 << 3)  # version 01, content size present
    bd = 0x40  # 64 KiB max block size
    desc = bytes([flg, bd]) + struct.pack("<Q", len(data))
    out += desc + bytes([_xxh32(desc, seed=0) >> 8 & 0xFF])
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 65536]
        pos += len(chunk)
        body = _compress_block(chunk)
        if len(body) < len(chunk):
            out += struct.pack("<I", len(body)) + body
        else:
            out += struct.pack("<I", (1 << 31) | len(chunk)) + chunk
    out += struct.pack("<I", 0)  # EndMark
    return bytes(out)


def _compress_block(chunk: bytes) -> bytes:
    """One LZ4 block: greedy 4-byte-hash matcher. The spec's end rules
    are honored — the last 5 bytes are always literals and a match
    never starts within the last 12 bytes."""
    n = len(chunk)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0

    def emit(lit_start: int, lit_end: int, offset: int, ml: int) -> None:
        lit = lit_end - lit_start
        token_lit = 15 if lit >= 15 else lit
        token_ml = 0 if ml == 0 else (15 if ml - 4 >= 15 else ml - 4)
        out.append((token_lit << 4) | token_ml)
        rest = lit - 15
        while rest >= 0:
            out.append(min(rest, 255))
            if rest < 255:
                break
            rest -= 255
        out.extend(chunk[lit_start:lit_end])
        if ml == 0:
            return
        out.append(offset & 255)
        out.append(offset >> 8)
        rest = (ml - 4) - 15
        while rest >= 0:
            out.append(min(rest, 255))
            if rest < 255:
                break
            rest -= 255

    while i + 13 <= n:
        key = chunk[i : i + 4]
        cand = table.get(key, -1)
        table[key] = i
        if cand >= 0 and i - cand <= 65535:
            ml = 0
            limit = n - 5 - i  # matches must end 5 bytes before the end
            while ml < limit and chunk[cand + ml] == chunk[i + ml]:
                ml += 1
            if ml >= 4:
                emit(anchor, i, i - cand, ml)
                i += ml
                anchor = i
                continue
        i += 1
    emit(anchor, n, 0, 0)
    return bytes(out)


def _xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (needed only for the frame header checksum byte liblz4
    validates on decode)."""
    p1, p2, p3, p4, p5 = 2654435761, 2246822519, 3266489917, 668265263, 374761393
    mask = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & mask

    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + p1 + p2) & mask
        v2 = (seed + p2) & mask
        v3 = seed
        v4 = (seed - p1) & mask
        while i + 16 <= n:
            v1 = (rotl((v1 + struct.unpack_from("<I", data, i)[0] * p2) & mask, 13) * p1) & mask
            v2 = (rotl((v2 + struct.unpack_from("<I", data, i + 4)[0] * p2) & mask, 13) * p1) & mask
            v3 = (rotl((v3 + struct.unpack_from("<I", data, i + 8)[0] * p2) & mask, 13) * p1) & mask
            v4 = (rotl((v4 + struct.unpack_from("<I", data, i + 12)[0] * p2) & mask, 13) * p1) & mask
            i += 16
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & mask
    else:
        h = (seed + p5) & mask
    h = (h + n) & mask
    while i + 4 <= n:
        h = (rotl((h + struct.unpack_from("<I", data, i)[0] * p3) & mask, 17) * p4) & mask
        i += 4
    while i < n:
        h = (rotl((h + data[i] * p5) & mask, 11) * p1) & mask
        i += 1
    h ^= h >> 15
    h = (h * p2) & mask
    h ^= h >> 13
    h = (h * p3) & mask
    h ^= h >> 16
    return h
