"""LZ4 codec (sources/lz4_codec.py) — wire pinned against the system
liblz4.so.1 in BOTH directions, plus fuzz/bounding and the
magic-sniffed shard contract."""

import ctypes
import ctypes.util
import random
import struct

import pytest

from data_lake_skyfit_spark.sources.lz4_codec import (
    _xxh32,
    lz4_compress,
    lz4_decompress,
)


def _load_ref():
    try:
        lib = ctypes.CDLL(ctypes.util.find_library("lz4") or "liblz4.so.1")
    except OSError:
        return None
    lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
    lib.LZ4F_compressFrameBound.argtypes = [ctypes.c_size_t, ctypes.c_void_p]
    lib.LZ4F_compressFrame.restype = ctypes.c_size_t
    lib.LZ4F_compressFrame.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_void_p,
    ]
    lib.LZ4F_isError.restype = ctypes.c_uint
    lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
    lib.LZ4F_createDecompressionContext.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint,
    ]
    lib.LZ4F_decompress.restype = ctypes.c_size_t
    lib.LZ4F_decompress.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_void_p,
    ]
    return lib


_REF = _load_ref()


def _ref_compress(data: bytes) -> bytes:
    cap = _REF.LZ4F_compressFrameBound(len(data), None)
    buf = ctypes.create_string_buffer(cap)
    r = _REF.LZ4F_compressFrame(buf, cap, data, len(data), None)
    assert not _REF.LZ4F_isError(r)
    return buf.raw[:r]


def _ref_decompress(z: bytes, n: int) -> bytes:
    ctx = ctypes.c_void_p()
    assert not _REF.LZ4F_isError(
        _REF.LZ4F_createDecompressionContext(ctypes.byref(ctx), 100)
    )
    dst = ctypes.create_string_buffer(max(n, 1))
    dsz = ctypes.c_size_t(max(n, 1))
    ssz = ctypes.c_size_t(len(z))
    r = _REF.LZ4F_decompress(ctx, dst, ctypes.byref(dsz), z, ctypes.byref(ssz), None)
    if _REF.LZ4F_isError(r):
        raise ValueError("liblz4 rejected payload")
    return dst.raw[: dsz.value]


def _corpus():
    rnd = random.Random(5)
    return [
        ("text", b" ".join(
            rnd.choice([b"alpha", b"beta", b"gamma", b"data"]) for _ in range(8000)
        )),
        ("rep", b"xyzxyzxyz" * 5000),
        ("rand", bytes(rnd.randrange(256) for _ in range(9000))),
        ("empty", b""),
        ("tiny", b"q"),
        ("big", b"The quick brown fox. " * 20000),  # multi-block
    ]


@pytest.mark.skipif(_REF is None, reason="liblz4 not present")
def test_reference_parity_both_directions():
    for name, data in _corpus():
        z = _ref_compress(data)
        assert lz4_decompress(z) == data, name
        z2 = lz4_compress(data)
        assert _ref_decompress(z2, len(data)) == data, name
        assert lz4_decompress(z2) == data, name


def test_xxh32_known_vectors():
    """The header-checksum hash against xxHash's published vectors."""
    assert _xxh32(b"", 0) == 0x02CC5D05
    assert _xxh32(b"", 0x9E3779B1) == 0x36B78AE7
    # 'a' and a 14+ byte ascii sample (from the reference test suite
    # convention: xxhsum of known strings)
    assert _xxh32(b"a", 0) == 0x550D7456
    assert _xxh32(b"abc", 0) == 0x32D153FF
    assert _xxh32(b"Hello World", 0) == 0xB1FD16EE


def test_skippable_and_concatenated_frames():
    a = lz4_compress(b"hello ")
    skip = struct.pack("<II", 0x184D2A5F, 3) + b"xyz"
    b = lz4_compress(b"world")
    assert lz4_decompress(skip + a + skip + b) == b"hello world"


def test_bounds_and_rejection():
    z = lz4_compress(b"payload " * 1000)
    with pytest.raises(ValueError, match="bound"):
        lz4_decompress(z, max_out=100)
    with pytest.raises(ValueError, match="legacy"):
        lz4_decompress(struct.pack("<I", 0x184C2102) + b"\x00" * 8)
    with pytest.raises(ValueError):
        lz4_decompress(b"\x00\x01\x02")


def test_fuzz_truncations_and_bitflips():
    base = lz4_compress(
        b"".join(b"line %d: the quick brown fox\n" % i for i in range(500))
    )
    for cut in range(0, len(base), 5):
        try:
            lz4_decompress(base[:cut], max_out=1 << 20)
        except ValueError:
            pass
    rnd = random.Random(13)
    for _ in range(300):
        b = bytearray(base)
        b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        try:
            lz4_decompress(bytes(b), max_out=1 << 20)
        except ValueError:
            pass


def test_magic_sniffed_shard_contract():
    """decompress_shard routes by magic: all four codecs and the
    plain-bytes fallthrough."""
    import gzip

    from data_lake_skyfit_spark.sources.zstd_codec import (
        zstd_compress,
        zstd_compress_store,
    )
    from data_lake_skyfit_spark.sources.zstd_shards import decompress_shard

    raw = b"the payload body\n" * 50
    assert decompress_shard(zstd_compress(raw)) == raw
    assert decompress_shard(zstd_compress_store(raw)) == raw
    assert decompress_shard(lz4_compress(raw)) == raw
    assert decompress_shard(gzip.compress(raw, mtime=0)) == raw
    # multi-member gzip (cat of two .gz) — the real-world shard concat
    two = gzip.compress(b"first|", mtime=0) + gzip.compress(b"second", mtime=0)
    assert decompress_shard(two) == b"first|second"
    assert decompress_shard(b"plain bytes, no magic") == b"plain bytes, no magic"
    with pytest.raises(ValueError, match="bound"):
        decompress_shard(gzip.compress(b"z" * 100000, mtime=0), max_out=1000)
