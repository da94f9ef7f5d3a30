"""WARC source: raw Common-Crawl archive files → the ``pages`` table.

The north rule's input is an Iceberg/parquet table of Common-Crawl-
style pages, but the upstream of that table is the crawl archive
itself — WARC files (ISO 28500). This connector closes the raw end of
the pipeline: ``spark.read.format("binaryFile")`` over ``*.warc[.gz]``
→ an Arrow-batched ``mapInPandas`` that parses records with the pure
kernel below → rows in the ``PAGES_SCHEMA`` shape (url, warc_ts,
html binary, text, lang), ready for ``read_pages``-style consumers
and the ``--from-html`` text-derivation path.

Format notes (no external library needed — WARC is a plain framed
text format):

* a record = header block (``WARC/1.x`` + ``Name: value`` lines,
  terminated by CRLFCRLF) + exactly ``Content-Length`` payload bytes
  + CRLFCRLF separator;
* only ``WARC-Type: response`` records become pages (request /
  metadata / warcinfo records are skipped, like every CC consumer);
* a response payload is an HTTP message: status line + headers +
  CRLFCRLF + body; the page html is the BODY;
* Common Crawl gzips each record as its own member and concatenates
  the members; Python's ``gzip`` module decompresses concatenated
  members transparently, so ``.warc.gz`` needs no special casing.

Scale shape: one WARC file = one ``binaryFile`` row = one parse task
(CC shards its crawl into ~1 GB files, so file-level parallelism is
the natural unit — same as every production WARC reader); parsing is
pure per-file work, no shuffle. ``spark.sql.files.maxPartitionBytes``
does not split binaryFile rows, so task memory is bounded by the
largest archive file.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Any, Dict, Iterator, List

from pyspark.sql import DataFrame, SparkSession

_CRLFCRLF = b"\r\n\r\n"


def parse_warc(blob: bytes) -> List[Dict[str, Any]]:
    """Parse one WARC (or .warc.gz) blob into response-record dicts:
    ``{url, warc_ts (datetime|None), html (bytes)}``.

    Pure function — unit-testable without Spark, and the exact code
    the executors run. Tolerant of trailing garbage / truncated tail
    records (a partial final record is dropped, not raised — crawl
    archives in the wild end mid-record after transfer truncation).
    """
    if blob[:2] == b"\x1f\x8b":  # gzip magic; multi-member transparent
        blob = gzip.GzipFile(fileobj=io.BytesIO(blob)).read()
    out: List[Dict[str, Any]] = []
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = blob.find(_CRLFCRLF, pos)
        if head_end < 0:
            break  # truncated header
        header = blob[pos:head_end].decode("utf-8", errors="replace")
        lines = header.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break  # lost framing — stop rather than emit garbage
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            break
        payload = blob[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if len(payload) < length:
            break  # truncated tail record
        if fields.get("warc-type") == "response":
            body = payload
            if body[:5] in (b"HTTP/", b"http/"):
                http_end = body.find(_CRLFCRLF)
                body = body[http_end + 4 :] if http_end >= 0 else b""
            ts = None
            raw_ts = fields.get("warc-date", "")
            try:
                ts = datetime.strptime(
                    raw_ts, "%Y-%m-%dT%H:%M:%SZ"
                ).replace(tzinfo=timezone.utc)
            except ValueError:
                pass
            out.append(
                {
                    "url": fields.get("warc-target-uri", ""),
                    "warc_ts": ts,
                    "html": body,
                }
            )
    return out


def read_warc(
    spark: SparkSession,
    path: str,
    derive_text: bool = True,
    lang: str | None = None,
) -> DataFrame:
    """Read WARC archive files into the ``pages`` schema.

    ``derive_text=True`` (default) fills ``text`` from the html via
    the same extraction expression the ``--from-html`` path uses
    (``functions.html.html_to_text`` — a pure regexp expression, so it
    runs JVM-side AFTER the Python parse); ``lang`` fills the lang
    column with a constant (language-ID runs downstream,
    ``functions.text.detect_language``) or NULL when None.
    """
    import pandas as pd  # executor-side import

    from pyspark.sql import functions as F

    from ..functions.html import html_to_text

    def parse_files(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for rec in parse_warc(bytes(blob)):
                    rows.append(
                        (rec["url"], rec["warc_ts"], rec["html"])
                    )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html"]
            )

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("content")
    )
    pages = raw.mapInPandas(
        parse_files, schema="url string, warc_ts timestamp, html binary"
    )
    text = (
        html_to_text(F.decode(F.col("html"), "UTF-8"))
        if derive_text
        else F.lit(None).cast("string")
    )
    return pages.select(
        "url",
        "warc_ts",
        "html",
        text.alias("text"),
        F.lit(lang).cast("string").alias("lang"),
    )


def build_warc(records: List[Dict[str, Any]], gzip_records: bool = False) -> bytes:
    """Serialize records into WARC bytes (the test/fixture inverse of
    ``parse_warc``): each ``{url, warc_ts, html}`` becomes a
    ``WARC-Type: response`` record with an HTTP payload. With
    ``gzip_records=True``, each record is its own gzip member
    (Common Crawl's exact layout)."""
    chunks = []
    for rec in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + rec["html"]
        )
        ts = rec.get("warc_ts")
        header = (
            "WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {rec['url']}\r\n"
            + (
                f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
                if ts
                else ""
            )
            + f"Content-Length: {len(http)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
        ).encode()
        record = header + b"\r\n" + http + b"\r\n\r\n"
        chunks.append(gzip.compress(record) if gzip_records else record)
    return b"".join(chunks)
