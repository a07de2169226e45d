"""WARC (ISO 28500) record build / parse — the web-archive format.

Common-Crawl-style corpora arrive as WARC files: concatenated records,
each ``WARC/1.0`` + CRLF-terminated named headers + CRLF CRLF + a
Content-Length-sized block + CRLF CRLF.  Two tiers here:

* **Per-record Catalyst tier** — :func:`warc_record_col` builds the full
  record bytes for a page row and :func:`parse_warc_record` recovers the
  headers and payload, both as pure Catalyst expressions (JVM-side,
  whole-stage codegen; no UDF).  Byte-exactness trick: the header region
  is ASCII by construction (URLs and dates carry no CR/LF or non-ASCII),
  so the FIRST ``\\r\\n\\r\\n`` found in the string cast sits at the same
  offset in characters and bytes — the payload is then sliced from the
  BINARY column at that byte offset for Content-Length octets, which
  stays correct for multi-byte UTF-8 payloads (zh pages) where char
  slicing would corrupt.
* **Stream tier** — :func:`read_warc_streams` segments whole WARC FILES
  (many records back-to-back) with an Arrow ``mapInPandas`` kernel that
  walks Content-Length jumps; delimiter scanning would break on payloads
  that themselves contain ``WARC/1.0`` or CRLF CRLF bytes (tested).

Scale shape: both tiers are embarrassingly parallel maps (no shuffle).
At 100 TB, files land one-per-task via the binaryFile source or an
Iceberg binary column; segmentation cost is linear in bytes.  The
DuckDB oracle for the round-trip entry re-derives the EXPECTED parsed
fields arithmetically (octet lengths, md5s, formatted dates) — a build
or parse defect anywhere diverges the hashes.

Reference analog: none in ODC (raster IO); webtext-axis source family
(SURVEY §2.1 extension) alongside ``sources/pages.py``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"
_SEP = CRLF + CRLF
VERSION = "WARC/1.0"
DATE_FMT_SPARK = "yyyy-MM-dd'T'HH:mm:ss'Z'"
DATE_FMT_DUCK = "%Y-%m-%dT%H:%M:%SZ"

# ISO 28500 §6 record types.  response/request/metadata/warcinfo get
# first-class build support here; the rest share the same framing and
# parse fine (the builder accepts them — nothing in the format differs).
RECORD_TYPES = frozenset({
    "warcinfo", "response", "request", "metadata",
    "resource", "revisit", "conversion", "continuation",
})


def uuid_urn_col(seed: Column) -> Column:
    """Deterministic ``<urn:uuid:...>`` record id: md5 of the seed
    formatted 8-4-4-4-12.  WARC-Record-ID must be globally unique — a
    content+role-derived digest gives that WITHOUT driver-side state or
    nondeterminism (re-running the writer reproduces the archive
    byte-for-byte, which is what the dedup/resume layers key on)."""
    h = F.md5(seed.cast("string"))
    return F.concat(
        F.lit("<urn:uuid:"),
        F.substring(h, 1, 8), F.lit("-"), F.substring(h, 9, 4), F.lit("-"),
        F.substring(h, 13, 4), F.lit("-"), F.substring(h, 17, 4), F.lit("-"),
        F.substring(h, 21, 12), F.lit(">"),
    )


def sql_uuid_urn(seed_expr: str) -> str:
    """DuckDB twin of :func:`uuid_urn_col` (term-identical md5 slicing)."""
    h = f"md5(CAST({seed_expr} AS VARCHAR))"
    return (
        f"('<urn:uuid:' || substr({h}, 1, 8) || '-' || substr({h}, 9, 4)"
        f" || '-' || substr({h}, 13, 4) || '-' || substr({h}, 17, 4)"
        f" || '-' || substr({h}, 21, 12) || '>')"
    )


def warc_record_col(uri: Column | None, date_ts: Column, payload_bin: Column,
                    warc_type: str = "response",
                    record_id: Column | None = None,
                    concurrent_to: Column | None = None,
                    refers_to: Column | None = None) -> Column:
    """Full WARC record bytes (binary) for one page.

    Header order is fixed (Type, [Record-ID], [Concurrent-To],
    [Refers-To], [Target-URI], Date, Content-Length) so the bytes are
    deterministic; Content-Length counts payload OCTETS.  ``record_id``
    / ``concurrent_to`` add the linkage headers request/metadata
    records carry (WARC-Concurrent-To names the response record they
    belong to); ``refers_to`` is the conversion-record linkage
    (WARC-Refers-To: a WET text record names the response it was
    derived from); ``uri=None`` omits WARC-Target-URI (warcinfo records
    have none).  Optional headers default off, so pre-existing
    archives' bytes are unchanged.
    """
    if warc_type not in RECORD_TYPES:
        raise ValueError(f"unknown WARC-Type: {warc_type!r}")
    parts = [
        F.lit(VERSION + CRLF),
        F.lit(f"WARC-Type: {warc_type}" + CRLF),
    ]
    if record_id is not None:
        parts += [F.lit("WARC-Record-ID: "), record_id, F.lit(CRLF)]
    if concurrent_to is not None:
        parts += [F.lit("WARC-Concurrent-To: "), concurrent_to, F.lit(CRLF)]
    if refers_to is not None:
        parts += [F.lit("WARC-Refers-To: "), refers_to, F.lit(CRLF)]
    if uri is not None:
        parts += [F.lit("WARC-Target-URI: "), uri, F.lit(CRLF)]
    parts += [
        F.lit("WARC-Date: "), F.date_format(date_ts, DATE_FMT_SPARK), F.lit(CRLF),
        F.lit("Content-Length: "), F.length(payload_bin).cast("string"),
        F.lit(_SEP),
    ]
    head = F.concat(*parts)
    return F.concat(F.encode(head, "UTF-8"), payload_bin, F.encode(F.lit(_SEP), "UTF-8"))


def _header(rec_str: Column, name: str) -> Column:
    return F.regexp_extract(rec_str, rf"(?m)^{name}: ([^\r\n]*)", 1)


def parse_warc_record(rec_bin: Column) -> Column:
    """Parse ONE record's bytes → struct(version, warc_type, target_uri,
    date, content_length, payload:binary).

    The header block is ASCII, so char offset of the first CRLF CRLF in
    the string cast == byte offset; the payload is sliced from the
    BINARY column (byte semantics) for Content-Length octets.
    """
    s = F.decode(rec_bin, "UTF-8")
    hdr_end = F.locate(_SEP, s)  # 1-based start of CRLF CRLF
    cl = _header(s, "Content-Length").cast("long")
    # Column.substr on BinaryType slices BYTES — correct for multi-byte
    # UTF-8 payloads where char slicing would corrupt
    payload = rec_bin.substr(hdr_end + F.lit(4), cl)
    return F.struct(
        F.substring(s, 1, len(VERSION)).alias("version"),
        _header(s, "WARC-Type").alias("warc_type"),
        _header(s, "WARC-Record-ID").alias("record_id"),
        _header(s, "WARC-Concurrent-To").alias("concurrent_to"),
        _header(s, "WARC-Refers-To").alias("refers_to"),
        _header(s, "WARC-Target-URI").alias("target_uri"),
        _header(s, "WARC-Date").alias("date"),
        cl.alias("content_length"),
        payload.alias("payload"),
    )


# --------------------------------------------------------------------------
# stream tier: whole WARC files (records back-to-back)
# --------------------------------------------------------------------------

_STREAM_SCHEMA = (
    "stream_id long, rec_index int, warc_type string, record_id string, "
    "concurrent_to string, refers_to string, target_uri string, "
    "date string, content_length long, payload binary, offset long, rec_len long"
)


def segment_warc_bytes(buf: bytes):
    """Walk one WARC stream by Content-Length jumps (pure python, used
    inside the Arrow kernel and directly testable).  Yields dicts.
    Raises ValueError on malformed framing — corrupt archives must fail
    loudly, not resync silently.

    Each record carries its byte ``offset`` in the stream and its total
    ``rec_len`` (header + payload + trailer octets) — the fields a CDX
    capture index stores so a later byte-range fetch can pull ONE record
    without reading the file prefix."""
    pos, idx = 0, 0
    n = len(buf)
    while pos < n:
        if buf[pos:pos + len(VERSION)] != VERSION.encode():
            raise ValueError(f"bad record start at byte {pos}")
        try:
            hdr_end = buf.index(b"\r\n\r\n", pos)
        except ValueError:
            raise ValueError(f"unterminated header block at byte {pos}") from None
        head = buf[pos:hdr_end].decode("utf-8")
        fields = {}
        for line in head.split(CRLF)[1:]:
            k, _, v = line.partition(": ")
            fields[k] = v
        if "Content-Length" not in fields:
            raise ValueError(f"record at byte {pos} has no Content-Length header")
        cl = int(fields["Content-Length"])
        body_start = hdr_end + 4
        payload = buf[body_start:body_start + cl]
        if len(payload) != cl or buf[body_start + cl:body_start + cl + 4] != b"\r\n\r\n":
            raise ValueError(f"truncated record at byte {pos}")
        yield {
            "rec_index": idx,
            "warc_type": fields.get("WARC-Type", ""),
            "record_id": fields.get("WARC-Record-ID", ""),
            "concurrent_to": fields.get("WARC-Concurrent-To", ""),
            "refers_to": fields.get("WARC-Refers-To", ""),
            "target_uri": fields.get("WARC-Target-URI", ""),
            "date": fields.get("WARC-Date", ""),
            "content_length": cl,
            "payload": payload,
            "offset": pos,
            "rec_len": body_start + cl + 4 - pos,
        }
        pos = body_start + cl + 4
        idx += 1


def _stream_reader(df: DataFrame, stream_id_col: str, bytes_col: str,
                   records_fn) -> DataFrame:
    """Shared Arrow mapInPandas scaffolding for both stream tiers:
    ``records_fn(bytes) -> iterator of record dicts`` does the framing
    (plain segmentation, or gunzip + segmentation)."""
    cols = ["stream_id", "rec_index", "warc_type", "record_id",
            "concurrent_to", "refers_to", "target_uri", "date",
            "content_length", "payload", "offset", "rec_len"]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for sid, buf in zip(pdf[stream_id_col], pdf[bytes_col]):
                for rec in records_fn(bytes(buf)):
                    rec["stream_id"] = sid
                    out.append(rec)
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(
                {c: [] for c in cols})

    return df.select(stream_id_col, bytes_col).mapInPandas(kernel, _STREAM_SCHEMA)


def build_warc_streams(df: DataFrame, group_col: str = "stream_id",
                       order_col: str = "doc_id",
                       rec_col: str = "rec") -> DataFrame:
    """(group, order, record-bytes) → one plain ``.warc`` stream per
    group: records sorted by ``order_col`` and concatenated (the
    uncompressed archive layout; offsets in the stream are then pure
    sums of record lengths — what the CDX oracle re-derives
    arithmetically).  Arrow applyInPandas kernel, one stream per task."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        blob = b"".join(bytes(r) for r in pdf[rec_col])
        return pd.DataFrame(
            {"stream_id": [pdf[group_col].iloc[0]], "content": [blob]}
        )

    return df.groupBy(group_col).applyInPandas(
        kernel, "stream_id long, content binary"
    )


def read_warc_streams(df: DataFrame, stream_id_col: str = "stream_id",
                      bytes_col: str = "content") -> DataFrame:
    """(stream_id, content:binary) → one row per WARC record.

    Arrow-batched mapInPandas; segmentation is Content-Length-driven so
    payloads containing 'WARC/1.0' or CRLF CRLF bytes cannot split a
    record (delimiter scanning would).  One task per stream chunk — the
    100-TB layout is one file per task via binaryFile/Iceberg."""
    return _stream_reader(df, stream_id_col, bytes_col, segment_warc_bytes)


# --------------------------------------------------------------------------
# .warc.gz tier: ONE GZIP MEMBER PER RECORD (the Common Crawl layout —
# members are independently seekable, so a byte-range fetch decompresses
# one record without reading the file prefix)
# --------------------------------------------------------------------------

def gzip_member(data: bytes, level: int = 6) -> bytes:
    """Deterministic gzip member (zlib wbits=31: mtime=0, no name — the
    same bytes on every run, unlike the gzip module's default mtime)."""
    import zlib

    c = zlib.compressobj(level, zlib.DEFLATED, 31)
    return c.compress(data) + c.flush()


def gunzip_members_coords(buf: bytes):
    """Yield ``(offset, compressed_len, data)`` for each gzip member in
    ``buf``.  The (offset, length) pair is what a .warc.gz CDX index
    stores: a byte-range fetch of exactly those bytes decompresses to
    one record without reading the file prefix.  All framing defects
    raise ValueError (the module's malformed-input contract), including
    corrupt DEFLATE data (zlib.error is wrapped)."""
    import zlib

    pos_left = bytes(buf)
    pos = 0
    while pos_left:
        d = zlib.decompressobj(31)
        try:
            out = d.decompress(pos_left)
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member: {e}") from None
        if not d.eof:
            raise ValueError("truncated gzip member")
        clen = len(pos_left) - len(d.unused_data)
        yield pos, clen, out + d.flush()
        pos += clen
        pos_left = d.unused_data


def gunzip_members(buf: bytes):
    """Yield the decompressed payload of each gzip member in ``buf``."""
    for _, _, data in gunzip_members_coords(buf):
        yield data


def build_warc_gz_streams(df: DataFrame, group_col: str = "stream_id",
                          order_col: str = "doc_id",
                          rec_col: str = "rec") -> DataFrame:
    """(group, order, record-bytes) → one .warc.gz stream per group:
    records sorted by ``order_col``, each wrapped as its own gzip member
    and concatenated — the distributed archive-writer shape (one output
    file per task/group).  Arrow applyInPandas kernel."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        blob = b"".join(gzip_member(bytes(r)) for r in pdf[rec_col])
        return pd.DataFrame(
            {"stream_id": [pdf[group_col].iloc[0]], "content": [blob]}
        )

    return df.groupBy(group_col).applyInPandas(
        kernel, "stream_id long, content binary"
    )


def _gz_records(buf: bytes):
    """gunzip each member, segment, renumber rec_index across the stream.
    offset/rec_len are rewritten to the COMPRESSED member coordinates —
    the .warc.gz CDX convention (a range fetch of those bytes gunzips to
    the record; the member-per-record layout makes the mapping 1:1 for
    archives this module writes, and offsets stay correct for multi-
    record members too: every record in a member shares its coords)."""
    idx = 0
    for m_off, m_len, member in gunzip_members_coords(buf):
        for rec in segment_warc_bytes(member):
            rec["rec_index"] = idx
            rec["offset"] = m_off
            rec["rec_len"] = m_len
            yield rec
            idx += 1


def read_warc_gz_streams(df: DataFrame, stream_id_col: str = "stream_id",
                         bytes_col: str = "content") -> DataFrame:
    """(stream_id, content:binary .warc.gz) → one row per record.  Each
    gzip member is decompressed independently and segmented; rec_index
    numbers records across the whole stream."""
    return _stream_reader(df, stream_id_col, bytes_col, _gz_records)


# --------------------------------------------------------------------------
# DuckDB twins (expected-field re-derivation for the round-trip oracle)
# --------------------------------------------------------------------------

def sql_warc_date(ts_expr: str) -> str:
    return f"strftime({ts_expr}, '{DATE_FMT_DUCK}')"


# every date this module emits is exactly this long (probed, not assumed)
_DATE_LEN = len("2024-01-01T00:00:00Z")


def sql_warc_record_length(uri_expr: str, payload_octets: str,
                           warc_type: str = "response") -> str:
    """Total record octet length, re-derived arithmetically: fixed header
    scaffolding + value lengths + payload + trailer."""
    fixed = (
        len(VERSION + CRLF)
        + len(f"WARC-Type: {warc_type}" + CRLF)
        + len("WARC-Target-URI: ") + len(CRLF)
        + len("WARC-Date: ") + _DATE_LEN + len(CRLF)
        + len("Content-Length: ") + len(_SEP)
        + len(_SEP)
    )
    return (
        f"({fixed} + strlen({uri_expr}) "
        f"+ length(CAST({payload_octets} AS VARCHAR)) + {payload_octets})"
    )
