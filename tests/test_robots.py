"""Retroactive robots.txt filter: parser subset, anti-join behavior,
broadcast plan shape."""

from pyspark.sql import functions as F

from gliner_spark.operators.robots import (
    parse_robots,
    robots_filter,
    robots_rules_df,
)


class TestParseRobots:
    def test_star_group_only(self):
        txt = (
            "User-agent: googlebot\nDisallow: /private\n\n"
            "User-agent: *\nDisallow: /tmp\nDisallow: /draft\n"
            "Allow: /tmp/ok\n"  # Allow out of scope (documented)
            "User-agent: other\nDisallow: /x\n"
        )
        assert parse_robots(txt) == ["/tmp", "/draft"]

    def test_comments_case_crlf_and_empty_disallow(self):
        txt = (
            "USER-AGENT: *\r\n"
            "# full comment line\r\n"
            "Disallow: /a  # trailing comment\r\n"
            "Disallow:\r\n"  # allow-all: contributes nothing
        )
        assert parse_robots(txt) == ["/a"]

    def test_no_star_group(self):
        assert parse_robots("User-agent: bot\nDisallow: /x\n") == []


class TestRobotsFilter:
    def pages(self, spark):
        rows = [
            (1, "https://a.example/keep/this"),
            (2, "https://a.example/private/doc"),
            (3, "https://a.example/privateer"),  # prefix match: dropped
            (4, "https://b.example/private/doc"),  # other host: kept
            (5, "https://A.EXAMPLE/private/x"),  # host case-folded: dropped
        ]
        return spark.createDataFrame(rows, "doc_id long, url string")

    def rules(self, spark):
        return robots_rules_df(
            spark, {"a.example": "User-agent: *\nDisallow: /private\n"}
        )

    def test_filtering(self, spark):
        kept = robots_filter(self.pages(spark), self.rules(spark))
        assert sorted(r.doc_id for r in kept.collect()) == [1, 4]
        assert kept.columns == ["doc_id", "url"]  # helper cols dropped

    def test_broadcast_anti_join_no_corpus_shuffle(self, spark):
        plan = (
            robots_filter(self.pages(spark), self.rules(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert "LeftAnti" in plan
        assert "SortMergeJoin" not in plan

    def test_empty_rules_keep_everything(self, spark):
        kept = robots_filter(self.pages(spark), robots_rules_df(spark, {}))
        assert kept.count() == 5


class TestReviewRegressions:
    def test_multi_agent_group_keeps_star_rules(self):
        # RFC 9309: consecutive User-agent lines form one group whose
        # rules apply to all listed agents, including *
        txt = "User-agent: *\nUser-agent: googlebot\nDisallow: /private\n"
        assert parse_robots(txt) == ["/private"]
        # a NEW group after rules resets the agent list
        txt2 = (
            "User-agent: *\nDisallow: /a\n"
            "User-agent: bot\nDisallow: /b\n"
        )
        assert parse_robots(txt2) == ["/a"]

    def test_root_url_without_path_covered_by_disallow_root(self, spark):
        pages = spark.createDataFrame(
            [(1, "https://a.example"), (2, "https://b.example")],
            "doc_id long, url string",
        )
        rules = robots_rules_df(
            spark, {"a.example": "User-agent: *\nDisallow: /\n"}
        )
        kept = [r.doc_id for r in robots_filter(pages, rules).collect()]
        assert kept == [2]
