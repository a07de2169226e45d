"""WARC source: build/parse round trip, stream segmentation, plan shape."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datacube_core_spark.sources.warc import (
    parse_warc_record,
    read_warc_streams,
    segment_warc_bytes,
    warc_record_col,
)

# adversarial payloads: empty, CRLF CRLF inside, a fake record header
# inside, multi-byte UTF-8, long run
PAYLOADS = [
    b"",
    b"plain body",
    b"a\r\n\r\nb",
    # fake embedded record with a DIFFERENT type value, so a last-match
    # (or payload-first) header-extraction regression is actually caught
    b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://evil/\r\n\r\nfake",
    "中文内容 and mixed ascii".encode("utf-8"),
    b"x" * 10_000,
]


def _reference_record(uri: str, date: str, payload: bytes) -> bytes:
    """Independent builder written from the spec (NOT warc_record_col)."""
    head = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\nContent-Length: {len(payload)}\r\n\r\n"
    ).encode("utf-8")
    return head + payload + b"\r\n\r\n"


def _df(spark):
    rows = [
        Row(i=i, uri=f"https://h{i}.example/p?q={i}", pb=bytearray(p))
        for i, p in enumerate(PAYLOADS)
    ]
    return spark.createDataFrame(rows, schema="i int, uri string, pb binary")


def test_build_matches_independent_reference(spark):
    df = _df(spark).select(
        "i", "uri", "pb",
        warc_record_col(
            F.col("uri"), F.timestamp_seconds(F.lit(1704067200)), F.col("pb")
        ).alias("rec"),
    )
    for r in df.collect():
        want = _reference_record(r.uri, "2024-01-01T00:00:00Z", bytes(r.pb))
        assert bytes(r.rec) == want, r.i


def test_parse_roundtrip_all_payloads(spark):
    df = _df(spark).select(
        "i", "uri", "pb",
        warc_record_col(
            F.col("uri"), F.timestamp_seconds(F.lit(1704067200)), F.col("pb")
        ).alias("rec"),
    )
    got = df.select("i", "uri", "pb", parse_warc_record(F.col("rec")).alias("p")).collect()
    for r in got:
        assert r.p.version == "WARC/1.0"
        assert r.p.warc_type == "response"
        assert r.p.target_uri == r.uri
        assert r.p.date == "2024-01-01T00:00:00Z"
        assert r.p.content_length == len(bytes(r.pb))
        assert bytes(r.p.payload) == bytes(r.pb), r.i


def test_segmenter_matches_reference_stream():
    date = "2024-06-05T04:03:02Z"
    stream = b"".join(
        _reference_record(f"https://s.example/{i}", date, p)
        for i, p in enumerate(PAYLOADS)
    )
    recs = list(segment_warc_bytes(stream))
    assert [r["rec_index"] for r in recs] == list(range(len(PAYLOADS)))
    assert [r["payload"] for r in recs] == PAYLOADS
    assert all(r["date"] == date for r in recs)
    assert list(segment_warc_bytes(b"")) == []


def test_segmenter_rejects_malformed():
    good = _reference_record("https://a/x", "2024-01-01T00:00:00Z", b"body")
    with pytest.raises(ValueError, match="bad record start"):
        list(segment_warc_bytes(b"GARBAGE" + good))
    # truncated payload (cut inside the block)
    with pytest.raises(ValueError, match="truncated"):
        list(segment_warc_bytes(good[:-5]))
    # wrong Content-Length (points past the trailer)
    bad = good.replace(b"Content-Length: 4", b"Content-Length: 6")
    with pytest.raises(ValueError, match="truncated"):
        list(segment_warc_bytes(bad))


def test_stream_reader_distributed(spark):
    date = "2024-06-05T04:03:02Z"
    streams = []
    for sid in range(4):
        payloads = [p + bytes([65 + sid]) for p in PAYLOADS]
        streams.append(
            Row(
                stream_id=sid,
                content=bytearray(
                    b"".join(
                        _reference_record(f"https://s{sid}.example/{i}", date, p)
                        for i, p in enumerate(payloads)
                    )
                ),
            )
        )
    df = spark.createDataFrame(streams, schema="stream_id long, content binary")
    out = read_warc_streams(df).collect()
    assert len(out) == 4 * len(PAYLOADS)
    by_key = {(r.stream_id, r.rec_index): r for r in out}
    for sid in range(4):
        for i, p in enumerate(PAYLOADS):
            r = by_key[(sid, i)]
            assert bytes(r.payload) == p + bytes([65 + sid])
            assert r.target_uri == f"https://s{sid}.example/{i}"
    plan = read_warc_streams(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_catalyst_parse_plan_has_no_python(spark):
    df = _df(spark).select(
        warc_record_col(
            F.col("uri"), F.timestamp_seconds(F.lit(1704067200)), F.col("pb")
        ).alias("rec")
    )
    plan = (
        df.select(parse_warc_record(F.col("rec")).alias("p"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_gzip_member_roundtrip_and_determinism():
    from datacube_core_spark.sources.warc import gunzip_members, gzip_member

    datas = [b"", b"abc", b"x" * 50_000, "中文".encode()]
    members = [gzip_member(d) for d in datas]
    assert members == [gzip_member(d) for d in datas]  # byte-deterministic
    stream = b"".join(members)
    assert list(gunzip_members(stream)) == datas
    assert list(gunzip_members(b"")) == []
    with pytest.raises(ValueError, match="truncated gzip"):
        list(gunzip_members(stream[:-3]))


def test_warc_gz_pipeline_matches_plain(spark):
    from datacube_core_spark.sources.warc import (
        build_warc_gz_streams,
        read_warc_gz_streams,
    )

    base = _df(spark).select(
        "i", "uri", "pb",
        warc_record_col(
            F.col("uri"), F.timestamp_seconds(F.lit(1704067200)), F.col("pb")
        ).alias("rec"),
    )
    d = base.select((F.col("i") % 2).cast("long").alias("stream_id"),
                    F.col("i").alias("doc_id"), "rec")
    out = read_warc_gz_streams(build_warc_gz_streams(d)).collect()
    assert len(out) == len(PAYLOADS)
    by_uri = {r.target_uri: r for r in out}
    for r in base.collect():
        g = by_uri[r.uri]
        assert bytes(g.payload) == bytes(r.pb)
        assert g.content_length == len(bytes(r.pb))
    # in-stream ordering: rec_index == rank of doc_id within its bucket
    for r in out:
        doc_id = int(r.target_uri.rsplit("=", 1)[1])
        rank = sum(1 for j in range(len(PAYLOADS)) if j % 2 == doc_id % 2 and j < doc_id)
        assert r.rec_index == rank


def test_segmenter_offsets_and_lengths():
    """offset/rec_len from the segmenter are exact byte coordinates:
    slicing the stream at [offset, offset+rec_len) re-segments to the
    SAME single record (the CDX range-fetch contract)."""
    date = "2024-06-05T04:03:02Z"
    stream = b"".join(
        _reference_record(f"https://s.example/{i}", date, p)
        for i, p in enumerate(PAYLOADS)
    )
    recs = list(segment_warc_bytes(stream))
    assert recs[0]["offset"] == 0
    assert sum(r["rec_len"] for r in recs) == len(stream)
    for r in recs:
        sl = stream[r["offset"]:r["offset"] + r["rec_len"]]
        (again,) = list(segment_warc_bytes(sl))
        assert again["payload"] == r["payload"]
        assert again["target_uri"] == r["target_uri"]
    # offsets are the running sum of preceding lengths
    run = 0
    for r in recs:
        assert r["offset"] == run
        run += r["rec_len"]


def test_gz_member_coords_range_fetch():
    """gz-tier offset/rec_len are COMPRESSED member coordinates: a byte
    range fetch of the slice gunzips to the record."""
    from datacube_core_spark.sources.warc import (
        gunzip_members,
        gunzip_members_coords,
        gzip_member,
    )

    date = "2024-01-01T00:00:00Z"
    records = [
        _reference_record(f"https://s.example/{i}", date, p)
        for i, p in enumerate(PAYLOADS)
    ]
    blob = b"".join(gzip_member(r) for r in records)
    coords = list(gunzip_members_coords(blob))
    assert [d for _, _, d in coords] == records
    assert coords[0][0] == 0
    assert sum(c for _, c, _ in coords) == len(blob)
    for (off, clen, data), rec in zip(coords, records):
        (only,) = list(gunzip_members(blob[off:off + clen]))
        assert only == rec


def test_gz_reader_emits_member_coords(spark):
    from datacube_core_spark.sources.warc import (
        build_warc_gz_streams,
        gunzip_members,
        read_warc_gz_streams,
    )

    base = _df(spark).select(
        "i",
        warc_record_col(
            F.col("uri"), F.timestamp_seconds(F.lit(1704067200)), F.col("pb")
        ).alias("rec"),
    )
    d = base.select(F.lit(0).cast("long").alias("stream_id"),
                    F.col("i").alias("doc_id"), "rec")
    streams = build_warc_gz_streams(d).collect()
    blob = bytes(streams[0].content)
    out = sorted(read_warc_gz_streams(build_warc_gz_streams(d)).collect(),
                 key=lambda r: r.rec_index)
    for r in out:
        (member,) = list(gunzip_members(blob[r.offset:r.offset + r.rec_len]))
        (rec,) = list(segment_warc_bytes(member))
        assert rec["payload"] == bytes(r.payload)


def test_plain_stream_builder_roundtrip(spark):
    """build_warc_streams (uncompressed .warc layout) → reader round
    trip; reader offsets equal the arithmetic running sum the CDX
    oracle uses."""
    from datacube_core_spark.sources.warc import build_warc_streams

    base = _df(spark).select(
        "i", "uri", "pb",
        warc_record_col(
            F.col("uri"), F.timestamp_seconds(F.lit(1704067200)), F.col("pb")
        ).alias("rec"),
        F.length(
            warc_record_col(
                F.col("uri"), F.timestamp_seconds(F.lit(1704067200)), F.col("pb")
            )
        ).alias("rlen"),
    )
    d = base.select((F.col("i") % 2).cast("long").alias("stream_id"),
                    F.col("i").alias("doc_id"), "rec")
    out = read_warc_streams(build_warc_streams(d)).collect()
    assert len(out) == len(PAYLOADS)
    rlen = {r.i: r.rlen for r in base.collect()}
    for r in out:
        doc_id = int(r.target_uri.rsplit("=", 1)[1])
        want_off = sum(rlen[j] for j in range(doc_id)
                       if j % 2 == doc_id % 2)
        assert r.offset == want_off, doc_id
        assert r.rec_len == rlen[doc_id]
