"""WARC source connector — raw Common-Crawl-style crawl ingest.

The pipeline's input_hint table (url, warc_ts, html, text, lang) assumes
someone already landed the crawl as parquet; in production the crawl
arrives as WARC files (ISO 28500: framed records with named headers),
usually .warc.gz with one gzip MEMBER per record so ranges are seekable.
This module turns a directory of .warc / .warc.gz files into exactly
that pages table, pure stdlib:

  read_warc(spark, path)  →  (url, warc_ts, html, rec_type, warc_file)

Execution shape: `binaryFile` gives one row per WARC file (content =
whole file — the standard unit; CC shards are ~1 GB and the task
per-file granularity is exactly how every production WARC reader
parallelizes, Spark's maxPartitionBytes does not split binaryFile rows),
then ONE `mapInPandas` pass walks records with Content-Length framing —
no regex over payloads, no per-row Python beyond the Arrow batch loop.
Multi-member gzip is handled by zlib streaming decompression
(decompressobj per member, unused_data chaining), which accepts both
per-record members (CC layout) and whole-file gzip.

Only `response` records carry pages; `request`/`warcinfo`/`metadata`
records are counted but not emitted (rec_type column carries the
breakdown when keep_all=True). The HTTP response head (status line +
headers) is stripped so `html` is the raw entity body — byte-identical
input to the U1 extractor.
"""

from __future__ import annotations

import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, rec_type string, "
    "warc_file string"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the CC per-record layout) or
    a single whole-file member; plain (non-gzip) bytes pass through."""
    if len(data) < 2 or data[:2] != b"\x1f\x8b":
        return data
    out = io.BytesIO()
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        # Feed in chunks so mid-member corruption (bit flips, bad CRC —
        # zlib.error) keeps the bytes decoded so far, the same posture as
        # a truncated member: one bad .warc.gz member must never fail the
        # whole ingest job after task retries.
        fed_to = 0
        try:
            for lo in range(0, len(rest), 1 << 16):
                fed_to = lo + (1 << 16)
                out.write(d.decompress(rest[lo:fed_to]))
                if d.eof:
                    break
        except zlib.error:
            return out.getvalue()
        if not d.eof:  # truncated member: stop at what we have
            break
        rest = d.unused_data + rest[fed_to:]
        if not rest:
            break
    return out.getvalue()


def _iter_records(raw: bytes):
    """Walk WARC/1.x records by Content-Length framing: header block up
    to CRLFCRLF, `Content-Length` bytes of payload, CRLFCRLF separator.
    Yields (headers: dict lower-cased, payload: bytes)."""
    pos, n = 0, len(raw)
    while pos < n:
        # skip inter-record padding
        while pos < n and raw[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= n or not raw[pos : pos + 5] == b"WARC/":
            break
        he = raw.find(b"\r\n\r\n", pos)
        if he < 0:
            break
        headers = {}
        for line in raw[pos:he].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break  # unframed record: cannot continue safely
        body = raw[he + 4 : he + 4 + clen]
        yield headers, body
        pos = he + 4 + clen


def _strip_http_head(body: bytes) -> bytes:
    """Drop the HTTP status line + headers from a response payload so the
    result is the raw entity body. Non-HTTP payloads pass through."""
    if body[:5] in (b"HTTP/",):
        sep = body.find(b"\r\n\r\n")
        if sep >= 0:
            return body[sep + 4 :]
    return body


def parse_warc_bytes(name: str, data: bytes, keep_all: bool = False):
    """Pure-Python record iterator for one WARC file's bytes → tuples of
    (url, warc_ts_iso, html, rec_type, warc_file). Response records get
    their HTTP head stripped; others emit html=None (and only when
    keep_all). Shared by the Spark reader and the tests (the byte-level
    oracle)."""
    raw = _gunzip_members(data)
    for headers, body in _iter_records(raw):
        rtype = headers.get("warc-type", "")
        if rtype != "response" and not keep_all:
            continue
        yield (
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            _strip_http_head(body) if rtype == "response" else None,
            rtype,
            name,
        )


def read_warc(
    spark: SparkSession, path: str, keep_all: bool = False
) -> DataFrame:
    """Directory (or glob) of .warc / .warc.gz → the input_hint pages
    frame (url, warc_ts, html, rec_type, warc_file). One task per WARC
    file; one Arrow-batched Python pass; warc_ts parsed from the ISO
    WARC-Date. Compose with detect_pages()/extract for the full
    crawl→KG path (tests drive exactly that)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows = []
            for name, data in zip(b["path"], b["content"]):
                rows.extend(parse_warc_bytes(name, data, keep_all=keep_all))
            df = pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "rec_type", "warc_file"],
            )
            # WARC-Date is ISO-8601 Zulu; parse as UTC then drop the tz
            # (the pages schema is a naive timestamp, like the fixtures)
            df["warc_ts"] = pd.to_datetime(
                df["warc_ts"], utc=True, errors="coerce", format="ISO8601"
            ).dt.tz_localize(None)
            yield df

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def write_warc(path: str, records, gzip_members: bool = False) -> int:
    """Tiny WARC writer for fixtures/tests (the encode half that makes
    the parser testable without external data): records are dicts with
    url, date (ISO), body (bytes), rec_type, http (bool — wrap body in
    an HTTP/1.1 200 response head). Returns the byte size written.
    gzip_members=True writes one gzip member per record (the CC
    layout)."""
    import gzip as _gzip

    out = io.BytesIO()
    for r in records:
        body = r["body"]
        if r.get("http", True) and r.get("rec_type", "response") == "response":
            head = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            )
            body = head + body
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + r.get("rec_type", "response").encode() + b"\r\n"
            b"WARC-Target-URI: " + r["url"].encode() + b"\r\n"
            b"WARC-Date: " + r["date"].encode() + b"\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        )
        rec = hdr + body + b"\r\n\r\n"
        out.write(_gzip.compress(rec) if gzip_members else rec)
    data = out.getvalue()
    with open(path, "wb") as fh:
        fh.write(data)
    return len(data)


# ------------------------------------------------- CDXJ index source --

CDXJ_FIELDS = "url string, status int, mime string, length bigint, " \
    "filename string, offset bigint"


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """CDX(J) crawl-index source — the OTHER Common-Crawl entry point:
    before touching a single WARC byte, real CC consumers select their
    fetch list from the cdx-*.gz index shards, whose line format is

        <SURT urlkey> <14-digit timestamp> <JSON blob>

    (e.g. `com,example)/page 20260101000000 {"url": "...", "status":
    "200", "mime": "text/html", "length": "1234", "filename":
    "crawl.warc.gz", "offset": "5678"}`). This reader is 100% JVM-side:
    `spark.read.text` (splittable, so a 1 GB shard fans out across
    tasks — unlike the per-file binaryFile WARC unit), two
    substring_index splits for the SURT key and timestamp, one
    `from_json` for the blob. Malformed lines (bad json, short lines,
    non-numeric ts) yield nulls and are FILTERED, never thrown — the
    hostile-input posture of the WARC reader (fuzz-tested); CC index
    JSON carries numerics as strings, so status/length/offset are cast
    through the string schema. Returns (urlkey, warc_ts, url, status,
    mime, length, filename, offset) — join filename/offset against the
    WARC store for ranged fetches, or feed url straight to the frontier.
    """
    lines = spark.read.text(path)
    urlkey = F.substring_index("value", " ", 1)
    rest = F.expr("substring(value, length(substring_index(value, ' ', 1)) + 2)")
    ts_raw = F.substring_index(rest, " ", 1)
    js = F.expr(
        "substring(value, length(substring_index(value, ' ', 2)) + 2)")
    blob = F.from_json(
        js,
        "url string, status string, mime string, length string, "
        "filename string, offset string",
    )
    return (
        lines.select(
            urlkey.alias("urlkey"),
            # try_to_timestamp: ANSI mode THROWS on a malformed ts (the
            # Spark 4 gotcha); hostile index lines must filter, not fail
            F.try_to_timestamp(ts_raw, F.lit("yyyyMMddHHmmss"))
            .alias("warc_ts"),
            blob.alias("b"),
        )
        .filter(F.col("warc_ts").isNotNull() & F.col("b").isNotNull()
                & F.col("b.url").isNotNull())
        .select(
            "urlkey", "warc_ts", F.col("b.url").alias("url"),
            # try_cast: ANSI cast throws on a non-numeric index field
            F.expr("try_cast(b.status AS int)").alias("status"),
            F.col("b.mime").alias("mime"),
            F.expr("try_cast(b.length AS bigint)").alias("length"),
            F.col("b.filename").alias("filename"),
            F.expr("try_cast(b.offset AS bigint)").alias("offset"),
        )
    )


def surt_key(url_col) -> "F.Column":
    """SURT urlkey from a url column (the CC index sort key): host
    reversed comma-wise + ')/' + path, lowercase, default-port-free —
    enough of the spec for index joins and host-range scans; query
    strings kept verbatim after '?'. Pure built-ins (concat_ws over a
    reversed split of parse_url(HOST))."""
    host = F.lower(F.parse_url(url_col, F.lit("HOST")))
    path = F.lower(F.coalesce(F.parse_url(url_col, F.lit("PATH")),
                              F.lit("/")))
    rev = F.concat_ws(",", F.reverse(F.split(host, "\\.")))
    return F.concat(rev, F.lit(")"), path)


def write_cdxj(df: DataFrame, path: str) -> None:
    """Round-trip writer for tests + for publishing an index of OUR
    crawl output: (url, warc_ts, status, mime, length, filename,
    offset) → CDXJ text shards, urlkey derived via surt_key. to_json
    keeps field order deterministic via named_struct; one text file per
    partition, every shard independently a valid CDXJ fragment."""
    line = F.concat_ws(
        " ",
        surt_key(F.col("url")),
        F.date_format("warc_ts", "yyyyMMddHHmmss"),
        F.to_json(F.struct(
            F.col("url"),
            F.col("status").cast("string").alias("status"),
            F.col("mime"),
            F.col("length").cast("string").alias("length"),
            F.col("filename"),
            F.col("offset").cast("string").alias("offset"),
        )),
    )
    df.select(line.alias("value")).write.mode("overwrite").text(path)
