"""WARC source connector: pure-kernel parse round-trip + Spark read."""

import datetime as dt
import gzip

from gliner_spark.sources.warc import build_warc, parse_warc, read_warc

TS = dt.datetime(2026, 3, 1, 12, 30, 0, tzinfo=dt.timezone.utc)

RECORDS = [
    {
        "url": "https://a.example/x",
        "warc_ts": TS,
        "html": b"<html><title>A</title><body><p>john smith works at acme corporation</p></body></html>",
    },
    {
        "url": "https://b.example/y",
        "warc_ts": TS,
        "html": "<html><body>café &amp; friends</body></html>".encode(),
    },
]


class TestParseWarc:
    def test_round_trip_plain_and_gzip(self):
        for gz in (False, True):
            got = parse_warc(build_warc(RECORDS, gzip_records=gz))
            assert [r["url"] for r in got] == [r["url"] for r in RECORDS]
            assert [r["html"] for r in got] == [r["html"] for r in RECORDS]
            assert all(r["warc_ts"] == TS for r in got)

    def test_non_response_records_skipped(self):
        req = (
            b"WARC/1.0\r\nWARC-Type: request\r\n"
            b"WARC-Target-URI: https://a.example/x\r\n"
            b"Content-Length: 4\r\n\r\nGET \r\n\r\n"
        )
        blob = req + build_warc(RECORDS[:1])
        got = parse_warc(blob)
        assert len(got) == 1 and got[0]["url"] == RECORDS[0]["url"]

    def test_truncated_tail_record_dropped(self):
        blob = build_warc(RECORDS)
        got = parse_warc(blob[:-40])  # cut into the second record
        assert len(got) == 1 and got[0]["url"] == RECORDS[0]["url"]

    def test_html_with_blank_lines_intact(self):
        html = b"<html>\r\n\r\n<body>two\r\n\r\nblocks</body></html>"
        (got,) = parse_warc(
            build_warc([{"url": "u", "warc_ts": None, "html": html}])
        )
        assert got["html"] == html and got["warc_ts"] is None


class TestReadWarc:
    def test_spark_read_and_text_derivation(self, spark, tmp_path):
        d = tmp_path / "crawl"
        d.mkdir()
        (d / "part-0.warc").write_bytes(build_warc(RECORDS[:1]))
        (d / "part-1.warc.gz").write_bytes(
            build_warc(RECORDS[1:], gzip_records=True)
        )
        (d / "ignored.txt").write_bytes(b"not a warc")
        pages = read_warc(spark, str(d), lang="en")
        rows = {r.url: r for r in pages.collect()}
        assert set(rows) == {r["url"] for r in RECORDS}
        a = rows["https://a.example/x"]
        assert bytes(a.html) == RECORDS[0]["html"]
        assert "john smith works at acme corporation" in a.text
        assert "<" not in a.text  # tags stripped
        b = rows["https://b.example/y"]
        assert "café & friends" in b.text  # entity decoded
        assert a.lang == "en"
        assert a.warc_ts is not None
        # the pages shape feeds the extraction operators directly
        from gliner_spark.operators.extract import extract_entities

        ents = extract_entities(
            pages.select("url", "text", "lang"),
            ["person", "organization"],
            gazetteer={
                "john smith": "person",
                "acme corporation": "organization",
            },
            scoring="gazetteer",
        )
        assert ents.where("label = 'person'").count() >= 1


class TestCorruptionTolerance:
    def test_truncated_gzip_keeps_clean_prefix(self):
        blob = build_warc(RECORDS, gzip_records=True)
        got = parse_warc(blob[:-15])  # cut into the final gzip member
        assert len(got) == 1 and got[0]["url"] == RECORDS[0]["url"]

    def test_garbage_gzip_tail(self):
        blob = build_warc(RECORDS[:1], gzip_records=True) + b"not gzip at all"
        got = parse_warc(blob)
        assert len(got) == 1

    def test_negative_content_length_terminates_and_resyncs(self):
        bad = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://bad.example/\r\n"
            b"Content-Length: -33\r\n\r\n"
        )
        stats = {}
        got = parse_warc(bad + build_warc(RECORDS[:1]), stats=stats)
        assert [r["url"] for r in got] == [RECORDS[0]["url"]]
        assert stats["dropped_bytes"] > 0

    def test_midfile_framing_loss_resyncs_to_next_record(self):
        stats = {}
        blob = (
            build_warc(RECORDS[:1])
            + b"GARBAGE BYTES NOT A RECORD"
            + build_warc(RECORDS[1:])
        )
        got = parse_warc(blob, stats=stats)
        assert [r["url"] for r in got] == [r["url"] for r in RECORDS]
        assert stats["dropped_bytes"] == len(b"GARBAGE BYTES NOT A RECORD")

    def test_non_utf8_page_text_derivation(self, spark, tmp_path):
        """A latin-1 page must not abort the job (Spark's own decode
        raises MALFORMED_CHARACTER_CODING); the replacement-decoded
        text still carries the extractable ASCII content."""
        d = tmp_path / "crawl"
        d.mkdir()
        latin1_html = "<html><body>café results: john smith</body></html>".encode("latin-1")
        (d / "l.warc").write_bytes(
            build_warc([{"url": "https://l.example/", "warc_ts": None, "html": latin1_html}])
        )
        (row,) = read_warc(spark, str(d)).collect()
        assert "john smith" in row.text
        assert bytes(row.html) == latin1_html  # binary untouched
