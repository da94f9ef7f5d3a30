"""Re-crawl snapshot diff: all four statuses + null-text semantics."""

from gliner_spark.operators.crawldelta import crawl_delta


def run(spark, old_rows, new_rows):
    old = spark.createDataFrame(old_rows, "url string, text string")
    new = spark.createDataFrame(new_rows, "url string, text string")
    return {
        r.url: (r.status, r.old_md5 is not None, r.new_md5 is not None)
        for r in crawl_delta(old, new).collect()
    }


class TestCrawlDelta:
    def test_all_statuses(self, spark):
        got = run(
            spark,
            [("a", "same"), ("b", "old text"), ("c", "bye")],
            [("a", "same"), ("b", "new text"), ("d", "hi")],
        )
        assert got["a"][0] == "unchanged"
        assert got["b"][0] == "changed"
        assert got["c"] == ("gone", True, False)
        assert got["d"] == ("added", False, True)

    def test_null_text_is_changed_not_added(self, spark):
        # url present in BOTH snapshots; text null on one side
        got = run(spark, [("a", None)], [("a", "now has text")])
        assert got["a"][0] == "changed"
        got = run(spark, [("a", None)], [("a", None)])
        assert got["a"][0] == "unchanged"  # both null: content equal

    def test_one_row_per_url(self, spark):
        got = run(spark, [("a", "x"), ("b", "y")], [("b", "y"), ("c", "z")])
        assert len(got) == 3
