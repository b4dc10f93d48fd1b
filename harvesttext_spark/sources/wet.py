"""WET (Common-Crawl extracted-text WARC) source reader — the input
format a real crawl pipeline starts from (the testdata parquet tables
stand in for post-ingest storage).

Spark-native parsing, zero Python in the hot path: records are split by
the text datasource's custom ``lineSep`` (every WET record begins with a
``WARC/1.0`` version line), and the header fields + body are carved out
with codegen string expressions.  At 100 TB this is exactly how WET
segments shard: one file per crawl segment, record splits inside the
scan, no whole-file buffering.

Format (public WARC 1.0 / Common Crawl WET layout)::

    WARC/1.0\r\n
    WARC-Type: conversion\r\n
    WARC-Target-URI: http://example.com/page\r\n
    WARC-Date: 2024-01-01T12:00:00Z\r\n
    Content-Length: 123\r\n
    \r\n
    <extracted plain text>\r\n
    \r\n
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_RECORD_SEP = "WARC/1.0\r\n"


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET file(s) -> (url, warc_ts timestamp, html binary NULL, text,
    lang NULL) — the pages-table shape the quality-filter job consumes.

    The scan splits on the WARC version line (``lineSep``), so each row
    arrives as ``headers CRLF CRLF body``; header values are pulled with
    anchored regexes (RE2-safe, multiline via explicit \\r\\n) and the
    body is everything after the first blank line, with the record's
    trailing CRLFs stripped.  Records without a Target-URI (the warcinfo
    preamble) are dropped.

    Documented approximation vs a Content-Length-driven parser: a body
    that itself contains the exact record-start byte sequence would be
    split early.  Real WET bodies are extracted plain text where the
    version line appears at record starts only; for adversarial input use
    ``read_wet_strict`` (same output schema, Content-Length carving)."""
    raw = spark.read.option("lineSep", _RECORD_SEP).text(path)
    uri = F.regexp_extract("value", "WARC-Target-URI: ([^\r\n]+)", 1)
    date = F.regexp_extract("value", "WARC-Date: ([^\r\n]+)", 1)
    body = F.regexp_replace(
        # everything after the first blank line (non-greedy header skip)
        F.regexp_extract("value", "(?s)\r\n\r\n(.*)$", 1),
        "(\r\n)+$",
        "",
    )
    return (
        raw.select(
            uri.alias("url"),
            # try_: crawl data has malformed/missing dates; ANSI to_timestamp throws
            F.try_to_timestamp(date, F.lit("yyyy-MM-dd'T'HH:mm:ssX")).alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            body.alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
        .filter(F.col("url") != "")
    )


def read_wet_strict(spark: SparkSession, path: str) -> DataFrame:
    """Content-Length-driven WET parser — the upgrade path ``read_wet``'s
    docstring names: record boundaries come from each record's declared
    body length, never from searching for the version line, so a body
    that EMBEDS the exact ``WARC/1.0\\r\\n`` byte sequence parses intact
    (the lineSep scan would split it early).

    Shape: ``binaryFile`` scan (one row per segment file — exactly how
    Common-Crawl WET shards: bounded ~150 MB segments, thousands of files
    in parallel; the per-task buffer is one segment, the same unit a
    warcio-based reader holds) + an Arrow-batched Python carver that
    walks ``header block -> CRLF CRLF -> Content-Length bytes -> CRLF
    CRLF`` sequentially.  Output schema identical to ``read_wet``;
    equality on clean input is fuzz-pinned in tests.

    Malformed tails (truncated final record, missing Content-Length) are
    dropped, not guessed at — strictness is the point.

    Gzip: real Common-Crawl shards are ``.warc.wet.gz`` (multi-member
    gzip, one member per record).  ``binaryFile`` does NOT decompress
    (unlike the ``text`` source's Hadoop codecs), so the carver gunzips
    blobs that start with the gzip magic — Python's ``gzip.decompress``
    consumes all concatenated members — before walking records;
    without this, compressed input would silently yield zero rows."""
    import gzip as _gzip
    import re as _re

    header_re = _re.compile(rb"^([A-Za-z0-9-]+):[ \t]*([^\r\n]*)\r?$")

    def carve(blob):
        if blob.startswith(b"\x1f\x8b"):
            blob = _gzip.decompress(blob)
        out = []
        pos = 0
        n = len(blob)
        start = b"WARC/1.0\r\n"
        while pos < n:
            if not blob.startswith(start, pos):
                break  # strict: desynchronized -> stop, don't resync
            pos += len(start)
            hdr_end = blob.find(b"\r\n\r\n", pos)
            if hdr_end < 0:
                break
            headers = {}
            for line in blob[pos:hdr_end].split(b"\r\n"):
                m = header_re.match(line)
                if m:
                    headers[m.group(1).lower()] = m.group(2)
            pos = hdr_end + 4
            clen = headers.get(b"content-length")
            if clen is None or not clen.isdigit():
                break  # strict: a record without a length can't be carved
            body_end = pos + int(clen)
            if body_end > n:
                break  # truncated final record
            body = blob[pos:body_end]
            pos = body_end
            # record terminator: two CRLFs (tolerate a missing final one
            # at EOF, as warcio does)
            if blob.startswith(b"\r\n\r\n", pos):
                pos += 4
            elif blob.startswith(b"\r\n", pos) and pos + 2 == n:
                pos += 2
            uri = headers.get(b"warc-target-uri")
            if not uri:
                continue  # warcinfo preamble etc.
            out.append(
                (
                    uri.decode("utf-8", "replace"),
                    headers.get(b"warc-date", b"").decode("ascii", "replace"),
                    body.decode("utf-8", "replace"),
                )
            )
        return out

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                rows.extend(carve(bytes(blob)))
            yield pd.DataFrame(rows, columns=["url", "_date", "text"])

    raw = spark.read.format("binaryFile").load(path).select("content")
    parsed = raw.mapInPandas(parse, schema="url string, _date string, text string")
    return parsed.select(
        "url",
        F.try_to_timestamp("_date", F.lit("yyyy-MM-dd'T'HH:mm:ssX")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit(None).cast("string").alias("lang"),
    )


def write_wet(rows: list[tuple[str, str, str]], path: str) -> None:
    """(url, iso_date, text) rows -> one WET file (test/synthesis helper;
    real pipelines read crawler output).  Deterministic byte layout.
    The warcinfo preamble carries a Content-Length like real Common-Crawl
    output — the strict parser depends on it to skip the record."""
    with open(path, "wb") as f:
        info = b"WET synth"
        f.write(
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: "
            + str(len(info)).encode()
            + b"\r\n\r\n"
            + info
            + b"\r\n\r\n"
        )
        for url, iso_date, text in rows:
            body = text.encode("utf-8")
            rec = (
                f"WARC/1.0\r\n"
                f"WARC-Type: conversion\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: {iso_date}\r\n"
                f"Content-Length: {len(body)}\r\n"
                f"\r\n"
            ).encode("utf-8")
            f.write(rec + body + b"\r\n\r\n")


def synth_wet_file(path: str, n: int = 50, seed: int = 3) -> None:
    """Deterministic WET segment for tests/smokes."""
    import random

    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "rivers", "carry", "stones",
             "quiet", "morning", "signal", "harvest", "metric"]
    rows = []
    for i in range(n):
        text = " ".join(rng.choice(words) for _ in range(rng.randint(5, 40)))
        rows.append(
            (
                f"https://wet{i % 7}.example/p/{i}",
                f"2024-01-{(i % 27) + 1:02d}T0{i % 9}:00:00Z",
                text + ("\r\nsecond line of the page" if i % 3 == 0 else ""),
            )
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_wet(rows, path)
