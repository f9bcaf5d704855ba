"""WARC (Web ARChive, ISO 28500) record reader — the ingestion format
of Common-Crawl-scale web corpora, i.e. the first step of every
web-scale LLM data pipeline (raw crawl → WARC records → text
extraction → curation/dedup).

Real parser, stdlib only: walks WARC/1.0 records (version line, CRLF
header block, Content-Length-delimited block, CRLF CRLF trailer),
supports the Common Crawl *.warc.gz convention of one gzip MEMBER per
record (sniffed and inflated member-by-member with zlib), and splits
HTTP response payloads into status + body. Hardening follows the r4
fuzz rules: every header-declared length is validated against the
actual payload BEFORE any slice, gzip inflation is bounded by an
explicit cap (zlib decompressobj with max_length, never a trusting
one-shot decompress), and malformed records raise ValueError — the
Spark kernel quarantines those rows with a NULL type instead of
failing the task (the corrupt-row discipline of sources/formats.py).

Spark surface: `read_warc_records` is an Arrow-batched mapInPandas
over a binary payload column — at scale each task parses its own
archive payloads independently (WARC's member-gzip framing exists
precisely so archives split; a production path-listing reader would
pair this kernel with per-file splits, same as the bronze reader).

Reference analog: raw blob handling (src/common/lake.py:59-71) — the
reference stores opaque payloads; the WARC walk is north-star surface
per SURVEY §7.5 (multimodal/ingestion plumbing).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "encode_warc",
    "read_warc_records",
    "parse_warc",
    "synthesize_warc_payloads",
]

_CRLF = b"\r\n"
_HTTP_HEADERS = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
_MAX_INFLATE = 64 << 20  # bound per gzip member (r4 fuzz rule)


def encode_warc(
    records: list[tuple[str, str | None, bytes]],
    *,
    gzip_members: bool = False,
) -> bytes:
    """Encode `(warc_type, target_uri, block_bytes)` records into a
    real WARC/1.0 byte stream; with `gzip_members`, each record becomes
    its own gzip member (the Common Crawl *.warc.gz convention that
    makes archives splittable at member boundaries)."""
    out = bytearray()
    for idx, (wtype, uri, block) in enumerate(records):
        head = bytearray(b"WARC/1.0\r\n")
        head += f"WARC-Type: {wtype}\r\n".encode()
        head += f"WARC-Record-ID: <urn:skyfit:{idx}>\r\n".encode()
        if uri is not None:
            head += f"WARC-Target-URI: {uri}\r\n".encode()
        head += f"Content-Length: {len(block)}\r\n".encode()
        head += _CRLF
        rec = bytes(head) + block + _CRLF + _CRLF
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            rec = co.compress(rec) + co.flush()
        out += rec
    return bytes(out)


def _split_gzip_members(data: bytes) -> list[bytes]:
    """Inflate a concatenation of gzip members, one output blob per
    member, each bounded by _MAX_INFLATE (a forged DEFLATE stream must
    not balloon memory — the BMP-height lesson applied to compression)."""
    out = []
    pos = 0
    # memoryview: re-slicing `data[pos:]` per member would copy the
    # whole remaining buffer each iteration — O(members x size) memcpy
    # on a Common-Crawl-shaped archive (code-review r4c).
    mv = memoryview(data)
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            blob = d.decompress(mv[pos:], _MAX_INFLATE)
        except zlib.error as e:
            raise ValueError(f"warc.gz: bad gzip member: {e}") from e
        if not d.eof:
            raise ValueError("warc.gz: gzip member exceeds inflate bound or is truncated")
        out.append(blob)
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("warc.gz: zero-length gzip member")
        pos += consumed
    return out


def parse_warc(data: bytes, *, include_body: bool = False) -> list[dict]:
    """Parse a WARC byte stream (plain or member-gzipped) into record
    dicts: warc_type, target_uri, content_length, http_status,
    body_md5. The HTTP split applies to response records: the block is
    status-line + headers + CRLF CRLF + body; other records hash the
    whole block."""
    if data[:2] == b"\x1f\x8b":
        chunks = _split_gzip_members(data)
    else:
        chunks = [data]
    recs: list[dict] = []
    for chunk in chunks:
        pos = 0
        while pos < len(chunk):
            if chunk[pos : pos + 5] != b"WARC/":
                raise ValueError("warc: record does not start with a WARC version line")
            hdr_end = chunk.find(_CRLF + _CRLF, pos)
            if hdr_end < 0:
                raise ValueError("warc: unterminated header block")
            headers: dict[str, str] = {}
            for line in chunk[pos:hdr_end].split(_CRLF)[1:]:
                k, _, v = line.partition(b":")
                if not _:
                    raise ValueError("warc: malformed header line")
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("ascii", "replace").strip()
                )
            try:
                clen = int(headers["content-length"])
            except (KeyError, ValueError) as e:
                raise ValueError("warc: missing/invalid Content-Length") from e
            block_at = hdr_end + 4
            # declared length vs actual payload BEFORE slicing (fuzz rule)
            if clen < 0 or block_at + clen + 4 > len(chunk):
                raise ValueError("warc: Content-Length overruns the payload")
            block = chunk[block_at : block_at + clen]
            if chunk[block_at + clen : block_at + clen + 4] != _CRLF + _CRLF:
                raise ValueError("warc: missing record trailer")
            wtype = headers.get("warc-type", "")
            status = None
            body = block
            if wtype == "response" and block[:5] == b"HTTP/":
                http_end = block.find(_CRLF + _CRLF)
                if http_end < 0:
                    raise ValueError("warc: response record without HTTP header end")
                status_line = block[: block.find(_CRLF)].split(b" ")
                if len(status_line) < 2 or not status_line[1].isdigit():
                    raise ValueError("warc: malformed HTTP status line")
                status = int(status_line[1])
                body = block[http_end + 4 :]
            rec = {
                "warc_type": wtype,
                "target_uri": headers.get("warc-target-uri"),
                "content_length": clen,
                "http_status": status,
                "body_md5": hashlib.md5(body).hexdigest(),
            }
            if include_body:
                rec["body"] = body.decode("utf-8", "replace")
            recs.append(rec)
            pos = block_at + clen + 4
    return recs


def synthesize_warc_payloads(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """id, text → a REAL 3-record WARC archive payload per row
    (warcinfo + HTTP response carrying the text + metadata), every odd
    id member-gzipped (the *.warc.gz convention). Closed form a SQL
    oracle reproduces without bytes: content lengths are 18 /
    45+strlen(text) / strlen('length: ' || strlen(text)); body md5s are
    md5 of the literal strings. Byte lengths, not codepoint counts —
    the oracle must use strlen(), not length()."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("payload", T.BinaryType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rid, text in zip(pdf[id_col], pdf["text"]):
                rid = int(rid)
                body = ("" if text is None else str(text)).encode("utf-8")
                uri = f"http://corpus.test/{rid}"
                payloads.append(
                    encode_warc(
                        [
                            ("warcinfo", None, b"software: skyfit\r\n"),
                            ("response", uri, _HTTP_HEADERS + body),
                            ("metadata", uri, f"length: {len(body)}".encode()),
                        ],
                        gzip_members=bool(rid % 2),
                    )
                )
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col, "text").mapInPandas(kernel, out_schema)


def read_warc_records(
    df: DataFrame, *, id_col: str = "doc_id", include_body: bool = False
) -> DataFrame:
    """payload → one row per WARC record: (id, rec_idx, warc_type,
    target_uri, content_length, http_status, body_md5[, body]) via
    Arrow-batched mapInPandas. A malformed archive yields ONE
    quarantine row with NULL warc_type and rec_idx -1 (same corrupt-row
    discipline as the CSV PERMISSIVE reader) rather than failing the
    task. `include_body` adds the decoded body text (utf-8, replace) —
    the column downstream extraction stages consume; leave it off for
    manifest-style scans so record metadata, not page bytes, crosses
    the exchange."""
    fields = [
        T.StructField(id_col, T.LongType()),
        T.StructField("rec_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("body_md5", T.StringType()),
    ]
    if include_body:
        fields.append(T.StructField("body", T.StringType()))
    schema = T.StructType(fields)
    cols = [f.name for f in fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                rid = int(rid)
                try:
                    # NULL and zero-record payloads take the quarantine
                    # row too (code-review r4c): bytes(None) raises
                    # TypeError, and parse_warc(b'') returns [] — both
                    # previously either failed the task or silently
                    # dropped the doc from the output.
                    if payload is None:
                        raise ValueError("null payload")
                    recs = parse_warc(bytes(payload), include_body=include_body)
                    if not recs:
                        raise ValueError("no WARC records in payload")
                except (ValueError, TypeError):
                    rows.append((rid, -1) + (None,) * (len(cols) - 2))
                    continue
                for i, r in enumerate(recs):
                    row = (
                        rid,
                        i,
                        r["warc_type"],
                        r["target_uri"],
                        r["content_length"],
                        r["http_status"],
                        r["body_md5"],
                    )
                    if include_body:
                        row += (r["body"],)
                    rows.append(row)
            out = pd.DataFrame(rows, columns=cols)
            out["content_length"] = out["content_length"].astype("Int64")
            out["http_status"] = out["http_status"].astype("Int32")
            out["rec_idx"] = out["rec_idx"].astype("int32")
            yield out

    return df.select(id_col, "payload").mapInPandas(kernel, schema)
