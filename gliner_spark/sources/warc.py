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


def _gunzip_tolerant(blob: bytes) -> bytes:
    """Decompress concatenated gzip members, keeping everything that
    decompressed cleanly when the final member is truncated or the
    tail is garbage (transfer-truncated crawl shards are routine; an
    all-or-nothing ``GzipFile.read()`` raises EOFError/BadGzipFile
    and would lose the whole ~1 GB archive over its last record)."""
    import zlib

    out = io.BytesIO()
    pos = 0
    n = len(blob)
    # member-by-member with zlib directly: GzipFile.read() buffers
    # across members, so a read that CROSSES into the truncated member
    # raises after the clean members' bytes are already lost inside
    # its internals; a per-member decompressobj returns the partial
    # final member's bytes instead of raising on truncation
    while pos < n and blob[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out.write(d.decompress(blob[pos:]))
        except zlib.error:
            break  # corrupt member — keep the clean prefix
        if not d.eof:
            break  # truncated final member (partial bytes kept)
        pos = n - len(d.unused_data)
    return out.getvalue()


def parse_warc(blob: bytes, stats: Dict[str, int] | None = None) -> List[Dict[str, Any]]:
    """Parse one WARC (or .warc.gz) blob into response-record dicts:
    ``{url, warc_ts (datetime|None), html (bytes)}``.

    Pure function — unit-testable without Spark, and the exact code
    the executors run. Corruption-tolerant, because crawl archives in
    the wild are: a truncated tail record (plain or gzipped) is
    dropped, not raised; mid-file framing loss RESYNCS to the next
    ``\\r\\nWARC/`` boundary instead of silently discarding the rest
    of the shard; a negative/garbage Content-Length cannot loop or
    hang. Pass ``stats`` (a dict) to receive ``dropped_bytes`` — the
    "no silent caps" accounting for skipped spans.
    """
    if blob[:2] == b"\x1f\x8b":  # gzip magic; multi-member transparent
        blob = _gunzip_tolerant(blob)
    out: List[Dict[str, Any]] = []
    dropped = 0
    pos = 0
    n = len(blob)

    def resync(bad_pos: int) -> int:
        """Next plausible record start after a corrupt span (or n) —
        the bare version magic, because garbage spans need not end
        with CRLF; only the already-corrupt span is scanned, so a
        payload containing the magic is not at risk (valid records
        are never searched). The magic is 'WARC/' — the same prefix
        the header parser accepts (ADVICE r4: resyncing on 'WARC/1.'
        while parsing any 'WARC/' version dropped the remainder of a
        WARC/0.x or future-version archive after one corrupt span);
        a false positive mid-garbage just fails the header parse and
        resyncs again, so the looser magic costs nothing."""
        nxt = blob.find(b"WARC/", bad_pos + 1)
        return nxt if nxt >= 0 else n

    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = blob.find(_CRLFCRLF, pos)
        if head_end < 0:
            dropped += n - pos
            break  # truncated header at EOF
        header = blob[pos:head_end].decode("utf-8", errors="replace")
        lines = header.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            nxt = resync(pos)
            dropped += nxt - pos
            pos = nxt
            continue
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:  # garbage/negative length: cannot trust framing
            nxt = resync(head_end)
            dropped += nxt - pos
            pos = nxt
            continue
        payload = blob[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if len(payload) < length:
            dropped += n - (head_end + 4)
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
    if stats is not None:
        stats["dropped_bytes"] = stats.get("dropped_bytes", 0) + dropped
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
    runs JVM-side AFTER the Python parse). The binary→string decode
    happens in the parser with ``errors="replace"``: web pages are
    frequently NOT valid UTF-8 (latin-1/shift-jis/…), and Spark 4's
    ``decode(..., 'UTF-8')`` raises MALFORMED_CHARACTER_CODING on the
    first such page, which would abort the whole ingestion job.
    ``lang`` fills the lang column with a constant (language-ID runs
    downstream, ``functions.text.detect_language``) or NULL when None.
    """
    import pandas as pd  # executor-side import

    from pyspark.sql import functions as F

    from ..functions.html import html_to_text

    def parse_files(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["url", "warc_ts", "html", "_html_str"]
        for pdf in batches:
            # yield per FILE, not per Arrow batch: a batch can hold
            # several ~1 GB archives' rows, and accumulating all their
            # decompressed records at once multiplies peak task memory
            # by the batch's file count
            for blob in pdf["content"]:
                rows = [
                    (
                        rec["url"],
                        rec["warc_ts"],
                        rec["html"],
                        rec["html"].decode("utf-8", errors="replace")
                        if derive_text
                        else None,
                    )
                    for rec in parse_warc(bytes(blob))
                ]
                yield pd.DataFrame(rows, columns=cols)

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("content")
    )
    pages = raw.mapInPandas(
        parse_files,
        schema="url string, warc_ts timestamp, html binary, _html_str string",
    )
    text = (
        html_to_text(F.col("_html_str"))
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
