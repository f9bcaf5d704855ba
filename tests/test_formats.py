"""CSV/ORC interchange: lossless round-trips and corrupt-row
quarantine (sources/formats.py)."""

from __future__ import annotations

import datetime
import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_lake_skyfit_spark.sources import formats


@pytest.fixture()
def tmp_root():
    root = tempfile.mkdtemp(prefix="skyfit_fmt_test_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 7, 179575), "a,b\"quoted\"", 0.1 + 0.2),
    (2, datetime.datetime(2024, 1, 2, 23, 59, 59, 999999), None, 6.55),
    (3, None, "", 1e-300),
]
SCHEMA = "id BIGINT, ts TIMESTAMP_NTZ, s STRING, v DOUBLE"


def test_csv_roundtrip_is_lossless(spark, tmp_root):
    df = spark.createDataFrame(ROWS, SCHEMA)
    formats.write_csv(df, f"{tmp_root}/csv")
    back = formats.read_csv(spark, f"{tmp_root}/csv", SCHEMA)
    got = sorted(map(tuple, back.collect()))
    want = sorted(map(tuple, df.collect()))
    # Timestamps microsecond-exact, doubles bit-exact (0.30000000000000004
    # survives), quotes/commas survive quoting. Caveat pinned here: CSV
    # cannot distinguish NULL from empty string under emptyValue="" —
    # the "" row comes back as NULL (use parquet/ORC when that matters).
    want = [(3, None, None, 1e-300) if r[0] == 3 else r for r in want]
    assert got == want


def test_orc_roundtrip_preserves_null_vs_empty(spark, tmp_root):
    df = spark.createDataFrame(ROWS, SCHEMA)
    formats.write_orc(df, f"{tmp_root}/orc")
    back = formats.read_orc(spark, f"{tmp_root}/orc")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert back.schema == df.schema


def _inject_line(csv_dir: str, line: str) -> None:
    """Append a malformed line to one part file, dropping the Hadoop
    local-FS .crc sidecar so the tamper isn't masked by a checksum
    error before the parser even sees the line."""
    [part] = [p for p in glob.glob(f"{csv_dir}/part-*.csv") if os.path.getsize(p)][:1]
    with open(part, "a") as fh:
        fh.write(line)
    crc = os.path.join(os.path.dirname(part), f".{os.path.basename(part)}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_csv_permissive_quarantines_corrupt_rows(spark, tmp_root):
    df = spark.createDataFrame(ROWS, SCHEMA)
    formats.write_csv(df, f"{tmp_root}/csv")
    _inject_line(f"{tmp_root}/csv", "notanint,alsonotatimestamp,x,notadouble\n")
    back = formats.read_csv(
        spark,
        f"{tmp_root}/csv",
        SCHEMA + ", _corrupt STRING",
        mode="PERMISSIVE",
        corrupt_col="_corrupt",
    )
    back = back.cache()
    bad = back.filter(F.col("_corrupt").isNotNull()).collect()
    assert len(bad) == 1 and bad[0]._corrupt.startswith("notanint")
    assert back.filter(F.col("_corrupt").isNull()).count() == len(ROWS)
    back.unpersist()


def test_csv_failfast_raises_on_corrupt_rows(spark, tmp_root):
    df = spark.createDataFrame(ROWS, SCHEMA)
    formats.write_csv(df, f"{tmp_root}/csv")
    _inject_line(f"{tmp_root}/csv", "junk,junk,junk,junk\n")
    with pytest.raises(Exception, match="MALFORMED|FAILED_READ"):
        formats.read_csv(spark, f"{tmp_root}/csv", SCHEMA).collect()


def test_csv_custom_separator_and_headerless(spark, tmp_root):
    df = spark.createDataFrame(ROWS, SCHEMA)
    formats.write_csv(df, f"{tmp_root}/csv", header=False, sep="\t")
    back = formats.read_csv(spark, f"{tmp_root}/csv", SCHEMA, header=False, sep="\t")
    assert back.count() == len(ROWS)


# ---------------------------------------------------------------- WARC


def test_warc_roundtrip_plain_and_gzip():
    """encode → parse across both framings; the gzip leg exercises the
    member-per-record *.warc.gz convention (real CC archives split at
    member boundaries)."""
    import hashlib

    from data_lake_skyfit_spark.sources.warc import (
        _HTTP_HEADERS,
        encode_warc,
        parse_warc,
    )

    body = b"the quick brown corpus"
    recs = [
        ("warcinfo", None, b"software: skyfit\r\n"),
        ("response", "http://x.test/1", _HTTP_HEADERS + body),
        ("metadata", "http://x.test/1", b"length: 22"),
    ]
    for gz in (False, True):
        out = parse_warc(encode_warc(recs, gzip_members=gz))
        assert [r["warc_type"] for r in out] == ["warcinfo", "response", "metadata"]
        assert out[0]["target_uri"] is None and out[0]["http_status"] is None
        assert out[1]["http_status"] == 200
        assert out[1]["content_length"] == len(_HTTP_HEADERS) + len(body)
        assert out[1]["body_md5"] == hashlib.md5(body).hexdigest()


def test_warc_corrupt_payloads_rejected_before_allocation():
    """r4 fuzz rules: declared lengths validated before slicing, gzip
    inflation bounded (a 70 MiB zero-bomb must raise, not allocate)."""
    import zlib

    from data_lake_skyfit_spark.sources.warc import encode_warc, parse_warc

    good = encode_warc([("metadata", "http://x/1", b"ok")])
    bomb = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    bomb_bytes = bomb.compress(b"\x00" * (70 << 20)) + bomb.flush()
    for bad in (
        good[:-3],  # truncated trailer
        good[:20],  # truncated header block
        b"WARC/1.0\r\nContent-Length: 99999\r\n\r\nhi\r\n\r\n",  # overrun
        b"WARC/1.0\r\nWARC-Type: x\r\n\r\nno length\r\n\r\n",  # missing length
        b"not a warc at all",
        bomb_bytes,  # inflate bound
    ):
        with pytest.raises(ValueError):
            parse_warc(bad)


def test_warc_spark_ingest_and_quarantine(spark):
    """read_warc_records parses real archives per row and quarantines a
    corrupt payload as one NULL-type row instead of failing the task."""
    from data_lake_skyfit_spark.sources import warc

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    media = warc.synthesize_warc_payloads(docs)
    # splice a corrupt payload in
    corrupt = spark.createDataFrame(
        [(99, bytearray(b"WARC/1.0\r\nContent-Length: 5000\r\n\r\nx\r\n\r\n"))],
        "doc_id long, payload binary",
    )
    out = warc.read_warc_records(media.unionByName(corrupt)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # responses rotate Content-Encoding by doc_id % 3 (r7b): 1 -> gzip
    # stored-DEFLATE (L+18+5 wire), 2 -> brotli store (L+4 wire for
    # 0 < L <= 65536), 0 -> identity; all with closed-form lengths
    import hashlib

    expected = {
        1: ("gzip", lambda L: 45 + 24 + L + 18 + 5),
        2: ("br", lambda L: 45 + 22 + L + 4),
        3: (None, lambda L: 45 + L),
    }
    for did, text in ((1, "alpha beta"), (2, "gamma"), (3, "delta epsilon zeta")):
        rows = sorted(by_doc[did], key=lambda r: r["rec_idx"])
        assert [r["warc_type"] for r in rows] == ["warcinfo", "response", "metadata"]
        assert rows[1]["target_uri"] == f"http://corpus.test/{did}"
        enc, clen_form = expected[did]
        assert rows[1]["content_encoding"] == enc
        assert rows[1]["content_length"] == clen_form(len(text))
        # body_md5 hashes the DECODED body regardless of encoding
        assert rows[1]["body_md5"] == hashlib.md5(text.encode()).hexdigest()
        assert rows[1]["http_status"] == 200
    q = by_doc[99]
    assert len(q) == 1 and q[0]["rec_idx"] == -1 and q[0]["warc_type"] is None


def test_warc_include_body_roundtrips_text(spark):
    """include_body=True hands downstream stages the decoded response
    body — the column the composed web pipeline consumes."""
    from data_lake_skyfit_spark.sources import warc

    docs = spark.createDataFrame(
        [(1, "body one"), (2, "body two here")], "doc_id long, text string"
    )
    out = warc.read_warc_records(
        warc.synthesize_warc_payloads(docs), include_body=True
    ).collect()
    resp = {r["doc_id"]: r for r in out if r["warc_type"] == "response"}
    assert resp[1]["body"] == "body one"
    assert resp[2]["body"] == "body two here"
    info = {r["doc_id"]: r for r in out if r["warc_type"] == "warcinfo"}
    assert info[1]["body"] == "software: skyfit\r\n"
    # metadata-only scan keeps the narrow schema
    narrow = warc.read_warc_records(warc.synthesize_warc_payloads(docs))
    assert "body" not in narrow.columns


def test_warc_null_and_empty_payloads_quarantine(spark):
    """code-review r4c: a NULL payload must not fail the task
    (bytes(None) is TypeError) and a zero-record payload must leave a
    quarantine marker, not silently vanish from the output."""
    from data_lake_skyfit_spark.sources import warc

    rows = spark.createDataFrame(
        [(1, None), (2, bytearray(b"")), (3, bytearray(b"\x1f\x8b\x00bad"))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in warc.read_warc_records(rows).collect()}
    assert len(out) == 3
    for i in (1, 2, 3):
        assert out[i]["rec_idx"] == -1 and out[i]["warc_type"] is None


# ---------------------------------------------------------- WebDataset


def test_tar_roundtrip_stdlib_crosscheck():
    """Our encoder's archives must parse with the stdlib tarfile READER
    (independent implementation — the byte-golden discipline), and our
    walker must agree with it."""
    import hashlib
    import io
    import tarfile

    from data_lake_skyfit_spark.sources.webdataset import encode_tar, parse_tar

    members = [("000017.txt", b"hello world"), ("000017.cls", b"3"),
               ("000017.seg.png", b"px17")]
    t = encode_tar(members)
    with tarfile.open(fileobj=io.BytesIO(t)) as tf:
        assert [(m.name, m.size) for m in tf.getmembers()] == [
            (n, len(p)) for n, p in members
        ]
        assert tf.extractfile("000017.txt").read() == b"hello world"
    out = parse_tar(t)
    assert [(r["name"], r["size"]) for r in out] == [(n, len(p)) for n, p in members]
    assert out[2]["member_md5"] == hashlib.md5(b"px17").hexdigest()


def test_tar_corrupt_shards_rejected():
    """Checksum mismatch, truncation (missing end-of-archive marker),
    size overrun and junk all raise — a truncated shard must never
    silently yield partial samples."""
    import struct

    from data_lake_skyfit_spark.sources.webdataset import encode_tar, parse_tar

    t = encode_tar([("a.txt", b"x" * 600)])
    flipped = bytearray(t)
    flipped[20] ^= 0xFF
    overrun = bytearray(t)
    overrun[124:136] = b"77777777777\x00"
    hdr = overrun[0:512]
    calc = sum(hdr) - sum(hdr[148:156]) + 8 * 32
    overrun[148:156] = (b"%06o" % calc) + b"\x00 "
    for bad in (bytes(flipped), t[:700], t[: len(t) - 1024], b"junk" * 200,
                bytes(overrun), b""):
        with pytest.raises(ValueError):
            parse_tar(bad)


def test_read_tar_members_grouping_on_spark(spark):
    from data_lake_skyfit_spark.sources import webdataset

    shards = spark.createDataFrame(
        [
            (1, bytearray(webdataset.encode_tar(
                [("000001.txt", b"t1"), ("000001.seg.png", b"s1"), ("noext", b"z")]))),
            (2, bytearray(b"not a tar shard at all, sorry!!!")),
        ],
        "doc_id long, payload binary",
    )
    rows = webdataset.read_tar_members(shards).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(r)
    ok = sorted(by[1], key=lambda r: r["rec_idx"])
    assert [(r["name"], r["sample_key"], r["ext"]) for r in ok] == [
        ("000001.txt", "000001", "txt"),
        ("000001.seg.png", "000001", "seg.png"),  # compound ext stays whole
        ("noext", "noext", ""),
    ]
    assert by[2][0]["rec_idx"] == -1 and by[2][0]["name"] is None  # quarantine


# ------------------------------------------------------------ TFRecord


def test_tfrecord_crc32c_standard_vector_and_roundtrip():
    import hashlib

    from data_lake_skyfit_spark.sources.tfrecord import (
        crc32c,
        encode_tfrecord,
        parse_tfrecord,
    )

    assert crc32c(b"123456789") == 0xE3069283  # the published check value
    assert crc32c(b"") == 0
    recs = [b"first record", b"", b"third \x00 binary \xff record"]
    out = parse_tfrecord(encode_tfrecord(recs))
    assert [(r["length"], r["payload_md5"]) for r in out] == [
        (len(r), hashlib.md5(r).hexdigest()) for r in recs
    ]


def test_tfrecord_corrupt_shards_rejected():
    import struct

    from data_lake_skyfit_spark.sources.tfrecord import encode_tfrecord, parse_tfrecord

    t = encode_tfrecord([b"first record", b"second"])
    payload_flip = bytearray(t)
    payload_flip[14] ^= 1
    lencrc_flip = bytearray(t)
    lencrc_flip[9] ^= 1
    overrun = bytearray(t)
    struct.pack_into("<Q", overrun, 0, 2**40)
    for bad in (bytes(payload_flip), bytes(lencrc_flip), bytes(overrun),
                t[:-3], t[:5]):
        with pytest.raises(ValueError):
            parse_tfrecord(bad)


def test_read_tfrecord_records_on_spark(spark):
    import hashlib

    from data_lake_skyfit_spark.sources import tfrecord

    shards = spark.createDataFrame(
        [
            (1, bytearray(tfrecord.encode_tfrecord([b"alpha", b"beta gamma"]))),
            (2, bytearray(b"definitely not a tfrecord")),
        ],
        "doc_id long, payload binary",
    )
    rows = tfrecord.read_tfrecord_records(shards).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(r)
    ok = sorted(by[1], key=lambda r: r["rec_idx"])
    assert [(r["length"], r["payload_md5"]) for r in ok] == [
        (5, hashlib.md5(b"alpha").hexdigest()),
        (10, hashlib.md5(b"beta gamma").hexdigest()),
    ]
    assert by[2][0]["rec_idx"] == -1 and by[2][0]["payload_md5"] is None


# ---------------------------------------------------------------------------
# ZIP shards (sources/zipshard.py)
# ---------------------------------------------------------------------------


def test_zip_cross_validates_against_stdlib_zipfile():
    """True external golden: stdlib zipfile must open our archives and
    we must parse archives stdlib zipfile writes (both methods)."""
    import hashlib
    import io
    import zipfile

    from data_lake_skyfit_spark.sources.zipshard import encode_zip, parse_zip

    members = [
        ("000001.txt", b"hello world " * 50),
        ("000001.cls", b"7"),
        ("a/b.seg.png", b"px42"),
    ]
    z = encode_zip(members)
    with zipfile.ZipFile(io.BytesIO(z)) as zf:
        assert zf.testzip() is None
        for name, data in members:
            assert zf.read(name) == data
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zf.writestr(name, data)
    recs = parse_zip(buf.getvalue())
    assert [(r["name"], r["size"]) for r in recs] == [
        (n, len(d)) for n, d in members
    ]
    assert [r["member_md5"] for r in recs] == [
        hashlib.md5(d).hexdigest() for _, d in members
    ]


def test_zip_method_selection_and_bounded_inflate():
    import struct as _struct
    import zlib

    import pytest as _pytest

    from data_lake_skyfit_spark.sources.zipshard import encode_zip, parse_zip

    z = encode_zip([("a.txt", b"repetitive " * 20), ("b.bin", b"\x01")])
    recs = parse_zip(z)
    assert [r["method"] for r in recs] == ["deflate", "store"]
    # corrupt usize in BOTH directory copies → bounded inflate catches
    # the mismatch instead of ballooning
    raw = bytearray(z)
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    # flip the central directory's usize field for the first entry
    cd = bytes(raw).find(b"PK\x01\x02")
    _struct.pack_into("<I", raw, cd + 24, 5)  # lying uncompressed size
    with _pytest.raises(ValueError):
        parse_zip(bytes(raw))


def test_zip_quarantine_and_member_rows(spark):
    from data_lake_skyfit_spark.sources.zipshard import encode_zip, read_zip_members

    good = encode_zip([("k.txt", b"abc"), ("k.cls", b"1")])
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"PK\x05\x06 but junk")), (3, None)],
        "doc_id long, payload binary",
    )
    rows = sorted(
        ((r["doc_id"], r["rec_idx"], r["name"]) for r in read_zip_members(df).collect())
    )
    assert rows == [(1, 0, "k.txt"), (1, 1, "k.cls"), (2, -1, None), (3, -1, None)]


def test_zip_rejects_lying_giant_usize_before_inflate():
    """A directory entry declaring usize=0xFFFFFFFF over a tiny deflate
    stream must be rejected BEFORE decompress runs (ratio + absolute
    caps), not after a multi-GiB allocation fails the length check."""
    import struct as _struct

    import pytest as _pytest

    from data_lake_skyfit_spark.sources.zipshard import encode_zip, parse_zip

    z = encode_zip([("a.txt", b"repetitive " * 20)])  # deflate member
    raw = bytearray(z)
    cd = bytes(raw).find(b"PK\x01\x02")
    _struct.pack_into("<I", raw, cd + 24, 0xFFFFFFFF)
    with _pytest.raises(ValueError, match="sanity cap"):
        parse_zip(bytes(raw))
    # below the absolute cap but far past deflate's 1032:1 ceiling
    _struct.pack_into("<I", raw, cd + 24, 64 << 20)
    with _pytest.raises(ValueError, match="deflate expansion"):
        parse_zip(bytes(raw))


def test_zip_member_byte_length_counts_bytes_not_chars(spark):
    """extract_zip_members + F.length(payload) must count BYTES of the
    inflated member (DuckDB strlen parity), not UTF-8 characters —
    pinned with a non-ASCII caption (via escapes, per the repo rule)."""
    from pyspark.sql import functions as F

    from data_lake_skyfit_spark.sources.zipshard import (
        encode_zip,
        extract_zip_members,
    )

    # "caf" + e-acute (2 bytes) + space + CJK U+4F60 (3 bytes) = 9 bytes,
    # 6 characters — escapes only, per the repo unicode rule
    text = "caf\u00e9 \u4f60"
    z = encode_zip([("c.txt", text.encode("utf-8"))])
    df = spark.createDataFrame([(1, bytearray(z))], "doc_id long, payload binary")
    got = (
        extract_zip_members(df, suffix=".txt")
        .select(F.length("payload").cast("long").alias("blen"))
        .collect()
    )
    assert len(text) == 6
    assert [r["blen"] for r in got] == [len(text.encode("utf-8"))] == [9]


def test_tar_extract_members_by_suffix(spark):
    from pyspark.sql import functions as F

    from data_lake_skyfit_spark.sources.webdataset import (
        encode_tar,
        extract_tar_members,
    )

    t = encode_tar([("000001.jpg", b"JPGBYTES"), ("000001.txt", b"cap")])
    df = spark.createDataFrame(
        [(1, bytearray(t)), (2, bytearray(b"not a tar"))],
        "doc_id long, payload binary",
    )
    got = extract_tar_members(df, suffix=".txt").collect()
    assert [(r["doc_id"], r["name"], bytes(r["payload"])) for r in got] == [
        (1, "000001.txt", b"cap")
    ]
    # byte-length contract the pipeline's caption audit relies on
    ln = (
        extract_tar_members(df, suffix=".jpg")
        .select(F.length("payload").alias("n"))
        .collect()
    )
    assert [r["n"] for r in ln] == [8]


def test_warc_content_encoding_bodies():
    """r7b: HTTP response bodies decode per Content-Encoding (gzip
    stored-DEFLATE, brotli store, identity); unknown encodings pass
    through raw with the column reporting them; a truncated encoded
    body makes the record malformed (ValueError)."""
    import hashlib

    from data_lake_skyfit_spark.sources import warc
    from data_lake_skyfit_spark.sources.brotli_codec import brotli_compress_store

    body = b"decoded payload text, long enough to matter " * 20

    def response_payload(enc_line: bytes, enc_body: bytes) -> bytes:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
                + enc_line + b"\r\n" + enc_body)
        return warc.encode_warc([("response", "http://x.test/1", http)])

    recs = warc.parse_warc(response_payload(
        b"Content-Encoding: gzip\r\n", warc._gzip_store(body)))
    assert recs[0]["content_encoding"] == "gzip"
    assert recs[0]["body_md5"] == hashlib.md5(body).hexdigest()

    recs = warc.parse_warc(response_payload(
        b"Content-Encoding: br\r\n", brotli_compress_store(body)))
    assert recs[0]["content_encoding"] == "br"
    assert recs[0]["body_md5"] == hashlib.md5(body).hexdigest()

    # unknown encoding: bytes stay raw, the column says what they are
    recs = warc.parse_warc(response_payload(
        b"Content-Encoding: snappy\r\n", body))
    assert recs[0]["content_encoding"] == "snappy"
    assert recs[0]["body_md5"] == hashlib.md5(body).hexdigest()

    # truncated gzip body -> the record is malformed
    import pytest as _pytest
    with _pytest.raises(ValueError):
        warc.parse_warc(response_payload(
            b"Content-Encoding: gzip\r\n", warc._gzip_store(body)[:-8]))

    # the gzip-store closed form the oracle mirrors
    assert len(warc._gzip_store(body)) == len(body) + 18 + 5
    assert len(warc._gzip_store(b"")) == 23
    assert len(warc._gzip_store(b"x" * 70000)) == 70000 + 18 + 10
