"""HTML extraction + host link graph: known answers, edge cases,
plan shape (extraction is one map stage; the graph is one exchange)."""

from pyspark.sql import functions as F

from gliner_spark.functions.html import (
    html_links,
    html_title,
    html_to_text,
)
from gliner_spark.operators.weblinks import host_link_graph


def extract(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(
        html_to_text("html").alias("t"),
        html_title("html").alias("title"),
        html_links("html").alias("links"),
    ).first()


PAGE = (
    "<html><head><title> A &amp; B </title>"
    "<style>p {color: red}</style>"
    '<script>var s = "<p>NOT TEXT</p>";</script></head>'
    "<body><h1>Head</h1><p>Hello &lt;world&gt;</p>"
    "<!-- secret --><div>tail</div>"
    '<a href="https://X.com/a">one</a>'
    '<a href="http://Y.org:80/b">two</a></body></html>'
)


class TestHtmlToText:
    def test_full_page(self, spark):
        row = extract(spark, PAGE)
        assert row.t == "Head\nHello <world>\ntail\none two"
        assert row.title == "A & B"
        assert row.links == ["https://X.com/a", "http://Y.org:80/b"]

    def test_script_style_head_content_removed(self, spark):
        row = extract(spark, PAGE)
        assert "NOT TEXT" not in row.t
        assert "color" not in row.t
        assert "A & B" not in row.t  # title is metadata, not body text
        assert "secret" not in row.t

    def test_entity_order_amp_last(self, spark):
        # '&amp;lt;' is the ESCAPED literal '&lt;' — must not become '<'
        row = extract(spark, "<p>x &amp;lt; y</p>")
        assert row.t == "x &lt; y"

    def test_non_html_passthrough(self, spark):
        row = extract(spark, "plain  text &amp; more")
        assert row.t == "plain text & more"
        assert row.title == ""
        assert row.links == []

    def test_case_insensitive_tags(self, spark):
        row = extract(
            spark,
            "<SCRIPT>die()</SCRIPT><P>a</P><BR><DIV>b</DIV>"
            "<A HREF=\"u\">x</A>",
        )
        assert row.t == "a\nb\nx"
        # href extraction is case-insensitive on the tag/attr too
        assert row.links == ["u"]

    def test_whitespace_collapse(self, spark):
        row = extract(spark, "<p>a   b\t c</p>\n\n<p>  d  </p>")
        assert row.t == "a b c\nd"

    def test_empty_and_tag_only(self, spark):
        assert extract(spark, "").t == ""
        assert extract(spark, "<div></div><br>").t == ""

    def test_extraction_is_single_map_stage(self, spark):
        df = spark.createDataFrame([(PAGE,)], "html string")
        plan = (
            df.select(html_to_text("html"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestHostLinkGraph:
    def pages(self, spark, rows):
        return spark.createDataFrame(
            [(u, h.encode("utf-8")) for u, h in rows], "url string, html binary"
        )

    def test_counts_multiplicity_and_lowercases(self, spark):
        df = self.pages(
            spark,
            [
                (
                    "https://src.com/1",
                    '<a href="https://A.com/x">1</a><a href="https://a.com/y">2</a>',
                ),
                ("https://src.com/2", '<a href="https://b.org/z">3</a>'),
            ],
        )
        got = {
            (r.src_host, r.dst_host): r.n_links
            for r in host_link_graph(df).collect()
        }
        assert got == {("src.com", "a.com"): 2, ("src.com", "b.org"): 1}

    def test_relative_and_mailto_links_dropped(self, spark):
        df = self.pages(
            spark,
            [
                (
                    "https://s.com/",
                    '<a href="/rel">r</a><a href="mailto:x@y.z">m</a>'
                    '<a href="https://ok.com/">k</a>',
                )
            ],
        )
        got = host_link_graph(df).collect()
        assert [(r.src_host, r.dst_host, r.n_links) for r in got] == [
            ("s.com", "ok.com", 1)
        ]

    def test_self_links_kept(self, spark):
        df = self.pages(
            spark, [("https://s.com/", '<a href="https://s.com/other">x</a>')]
        )
        got = host_link_graph(df).collect()
        assert [(r.src_host, r.dst_host) for r in got] == [("s.com", "s.com")]

    def test_single_exchange(self, spark):
        df = self.pages(spark, [("https://s.com/", '<a href="https://t.com/">x</a>')])
        plan = (
            host_link_graph(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1  # only the (src,dst) groupBy


class TestHtmlAnchors:
    def test_anchor_text_normalized(self, spark):
        from gliner_spark.functions.html import html_anchors

        df = spark.createDataFrame(
            [
                (
                    '<a href="https://x.com/">B&amp;B  <b>inn</b></a>'
                    '<a href="/rel"><img src="i.png"></a>'
                    "<a name=\"no-href\">skip</a>",
                )
            ],
            "html string",
        )
        (row,) = df.select(html_anchors("html").alias("a")).collect()
        assert [tuple(x) for x in row.a] == [
            ("https://x.com/", "B&B inn"),
            ("/rel", ""),  # image-only anchor: no visible text
        ]

    def test_empty_html(self, spark):
        from gliner_spark.functions.html import html_anchors

        df = spark.createDataFrame([("no links here",)], "html string")
        (row,) = df.select(html_anchors("html").alias("a")).collect()
        assert row.a == []
