"""WARC source connector: byte-level round-trip (write_warc is the
fixture encoder), per-record-gzip-member handling (the Common Crawl
layout), HTTP head stripping, non-response filtering, and composition
with the real fused detect stage — raw crawl bytes → detections."""

from __future__ import annotations

import os

import pytest

ROOT = "/tmp/mxsparkg_test_warc"


def _records():
    return [
        {
            "url": "http://ex.com/a",
            "date": "2026-01-02T03:04:05Z",
            "body": b"<html><body>Jean Dupont travaille.</body></html>",
            "rec_type": "response",
        },
        {
            "url": "http://ex.com/a",
            "date": "2026-01-02T03:04:04Z",
            "body": b"GET /a HTTP/1.1\r\nHost: ex.com\r\n\r\n",
            "rec_type": "request",
            "http": False,
        },
        {
            "url": "http://ex.com/b",
            "date": "2026-01-02T03:05:06Z",
            "body": "<html>café — unicode bytes</html>".encode(),
            "rec_type": "response",
        },
    ]


def test_parse_warc_bytes_roundtrip_plain_and_gzip(tmp_path):
    """The parser must return exactly the response bodies written, with
    the HTTP head stripped, in both plain and per-record-gzip layouts;
    request records are skipped unless keep_all."""
    from mxsparkg.warc import parse_warc_bytes, write_warc

    for gz in (False, True):
        p = str(tmp_path / f"t{'_gz' if gz else ''}.warc")
        write_warc(p, _records(), gzip_members=gz)
        data = open(p, "rb").read()
        got = list(parse_warc_bytes("f", data))
        assert [(u, t) for u, d, h, t, _ in got] == [
            ("http://ex.com/a", "response"),
            ("http://ex.com/b", "response"),
        ]
        assert got[0][2] == _records()[0]["body"]  # head stripped, exact
        assert got[1][2] == _records()[2]["body"]
        every = list(parse_warc_bytes("f", data, keep_all=True))
        assert [t for _, _, _, t, _ in every] == [
            "response", "request", "response"]
        assert every[1][2] is None  # non-response payloads not emitted


def test_read_warc_dataframe_and_detect_composition(spark, tiny_fixtures):
    """read_warc over a directory of one plain + one gzip WARC must give
    the pages frame (typed timestamp, binary html), and the frame must
    feed the REAL fused detect stage: a page whose body embeds a known
    fixture page's html produces the same detections as the fixture row
    (the byte-identical U1 contract, end to end from raw crawl bytes)."""
    import shutil

    import pyspark.sql.functions as F

    from mxsparkg.detect import broadcast_model, detect_pages
    from mxsparkg.warc import read_warc, write_warc

    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT)
    fix = spark.read.parquet(f"{tiny_fixtures}/pages.parquet").orderBy(
        "url").limit(2).collect()
    recs = [
        {
            "url": r.url,
            "date": "2026-02-03T04:05:06Z",
            "body": bytes(r.html),
            "rec_type": "response",
        }
        for r in fix
    ]
    write_warc(f"{ROOT}/part0.warc", recs[:1], gzip_members=False)
    write_warc(f"{ROOT}/part1.warc.gz", recs[1:], gzip_members=True)

    pages = read_warc(spark, ROOT)
    rows = {r.url: r for r in pages.collect()}
    assert set(rows) == {r.url for r in fix}
    assert all(r.rec_type == "response" for r in rows.values())
    assert str(rows[fix[0].url].warc_ts) == "2026-02-03 04:05:06"
    for r in fix:
        assert bytes(rows[r.url].html) == bytes(r.html)  # byte-identical

    # raw crawl bytes → the real fused extract+detect stage
    bc = broadcast_model(spark)
    got = detect_pages(
        pages.select("url", "warc_ts", "html"), bc
    )
    want = detect_pages(
        spark.read.parquet(f"{tiny_fixtures}/pages.parquet").filter(
            F.col("url").isin([r.url for r in fix])
        ),
        bc,
    )
    key = ["url", "sent_id", "kind", "m_start", "surface", "subj", "pred",
           "obj"]
    assert got.count() == want.count() > 0
    assert got.select(*key).exceptAll(want.select(*key)).count() == 0


def test_parse_warc_bytes_hostile_inputs_never_raise():
    """Crawl data is hostile: truncated records, lying Content-Length,
    garbage between records, truncated gzip members. The parser must
    never raise and must keep every record it can frame."""
    import gzip

    from mxsparkg.warc import parse_warc_bytes, write_warc

    good = {
        "url": "http://ok.com/", "date": "2026-01-01T00:00:00Z",
        "body": b"<html>fine</html>", "rec_type": "response",
    }
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".warc") as f:
        write_warc(f.name, [good])
        blob = open(f.name, "rb").read()

    # 1. truncated mid-payload: framing fails for the cut record only
    assert list(parse_warc_bytes("t", blob[: len(blob) // 2])) == []
    # 2. good record + garbage tail: the good record survives
    got = list(parse_warc_bytes("t", blob + b"NOT A WARC RECORD"))
    assert len(got) == 1 and got[0][0] == "http://ok.com/"
    # 3. header with a non-numeric Content-Length: parser stops cleanly
    bad = blob.replace(b"Content-Length: ", b"Content-Length: x", 1)
    assert list(parse_warc_bytes("t", bad)) == []
    # 4. whole-file gzip parses identically; a truncated member
    #    decompresses its prefix and never raises
    gz = gzip.compress(blob)
    assert [r[0] for r in parse_warc_bytes("t", gz)] == ["http://ok.com/"]
    half = gz[: len(gz) // 2]
    assert isinstance(list(parse_warc_bytes("t", half)), list)  # no raise
    # 5. empty and non-WARC inputs
    assert list(parse_warc_bytes("t", b"")) == []
    assert list(parse_warc_bytes("t", b"hello world")) == []
    # 6. mid-member CORRUPTION (bit flip, not truncation): zlib.error
    #    must be swallowed, keeping whatever decoded before the flip —
    #    one bad .warc.gz member must never fail the ingest task
    corrupt = bytearray(gz)
    corrupt[len(gz) * 3 // 4] ^= 0xFF  # flip a byte inside the deflate body
    assert isinstance(list(parse_warc_bytes("t", bytes(corrupt))), list)
    # 7. two concatenated members, second corrupt: the first member's
    #    record survives (per-member isolation)
    two = gz + bytes(corrupt)
    got2 = list(parse_warc_bytes("t", two))
    assert got2 and got2[0][0] == "http://ok.com/"


def test_cdxj_round_trip_and_hostile_lines(spark, tmp_path):
    """write_cdxj -> read_cdxj is lossless on the typed fields, the SURT
    urlkey is derived correctly (host reversed comma-wise), and hostile
    lines (truncated, bad json, bad timestamp, blank) are filtered, not
    thrown — the WARC reader's hostile-input posture."""
    import datetime as dt

    from mxsparkg.warc import read_cdxj, write_cdxj

    rows = [
        ("http://www.example.com/Some/Path", dt.datetime(2026, 1, 2, 3, 4, 5),
         200, "text/html", 1234, "c0.warc.gz", 0),
        ("http://sub.host.org/", dt.datetime(2026, 1, 2, 3, 4, 6),
         404, "text/plain", 9, "c0.warc.gz", 1234),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, status int, mime string, "
        "length bigint, filename string, offset bigint",
    )
    out = str(tmp_path / "cdxj")
    write_cdxj(df, out)

    # splice hostile lines into the same directory as an extra shard
    hostile = "\n".join([
        "com,junk)/x 20260101000000 {not json at all",
        "com,junk)/y NOTATIMESTAMP {\"url\": \"http://junk.com/y\"}",
        "shortline",
        "",
        "com,junk)/z 20260101000000 {\"status\": \"200\"}",  # url missing
        # non-numeric numerics: row kept, fields null (try_cast posture)
        "com,keep)/n 20260101000001 {\"url\": \"http://keep.com/n\","
        " \"status\": \"abc\", \"length\": \"-\", \"offset\": \"x\"}",
    ])
    with open(f"{out}/hostile.txt", "w") as f:
        f.write(hostile)

    got = {r.url: r for r in read_cdxj(spark, out).collect()}
    assert set(got) == {"http://www.example.com/Some/Path",
                        "http://sub.host.org/", "http://keep.com/n"}
    k = got["http://keep.com/n"]
    assert (k.status, k.length, k.offset) == (None, None, None)
    a = got["http://www.example.com/Some/Path"]
    assert a.urlkey == "com,example,www)/some/path"
    assert (a.status, a.mime, a.length, a.filename, a.offset) == (
        200, "text/html", 1234, "c0.warc.gz", 0)
    assert a.warc_ts == dt.datetime(2026, 1, 2, 3, 4, 5)
    b = got["http://sub.host.org/"]
    assert b.urlkey == "org,host,sub)/"
    assert (b.status, b.offset) == (404, 1234)
