"""Retroactive robots.txt filter: RFC 9309 parser (allow/disallow,
wildcard truncation), longest-match precedence, broadcast plan shape,
path+query matching, unparseable-host handling."""

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
            "Allow: /tmp/ok\n"
            "User-agent: other\nDisallow: /x\n"
        )
        assert parse_robots(txt) == [
            ("disallow", "/tmp"),
            ("disallow", "/draft"),
            ("allow", "/tmp/ok"),
        ]

    def test_comments_case_crlf_and_empty_disallow(self):
        txt = (
            "USER-AGENT: *\r\n"
            "# full comment line\r\n"
            "Disallow: /a  # trailing comment\r\n"
            "Disallow:\r\n"  # allow-all: contributes nothing
        )
        assert parse_robots(txt) == [("disallow", "/a")]

    def test_no_star_group(self):
        assert parse_robots("User-agent: bot\nDisallow: /x\n") == []

    def test_disallow_wildcards_truncate_conservatively(self):
        # ADVICE r4 (medium): '/private*' / '/*.php' previously matched
        # NOTHING — opted-out pages were silently KEPT. Truncation at
        # the first '*' over-drops instead.
        txt = (
            "User-agent: *\n"
            "Disallow: /private*\n"
            "Disallow: /a/*.php\n"
            "Disallow: /exact$\n"
            "Disallow: /wild*card$\n"
            "Disallow: *.gif\n"  # leading wildcard → host-wide
        )
        assert parse_robots(txt) == [
            ("disallow", "/private"),
            ("disallow", "/a/"),
            ("disallow", "/exact"),
            ("disallow", "/wild"),
            ("disallow", "/"),
        ]

    def test_allow_wildcards_are_forfeited(self):
        # widening an Allow would RETAIN opted-out pages — the
        # carve-out is discarded instead (over-drop direction)
        txt = (
            "User-agent: *\nDisallow: /p\n"
            "Allow: /p/ok*\nAllow: /p/exact$\nAllow: /p/plain\n"
        )
        assert parse_robots(txt) == [
            ("disallow", "/p"),
            ("allow", "/p/plain"),
        ]


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

    def test_broadcast_join_no_corpus_shuffle(self, spark):
        plan = (
            robots_filter(self.pages(spark), self.rules(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_empty_rules_keep_everything(self, spark):
        kept = robots_filter(self.pages(spark), robots_rules_df(spark, {}))
        assert kept.count() == 5


class TestLongestMatchPrecedence:
    ROBOTS = {
        "a.example": (
            "User-agent: *\n"
            "Disallow: /p\n"
            "Allow: /p/ok\n"       # longer allow carves out /p/ok*
            "Disallow: /p/ok/no\n"  # still longer disallow re-drops
            "Allow: /tie\n"
            "Disallow: /tie\n"      # equal length: allow wins (RFC 9309)
        )
    }

    def pages(self, spark):
        rows = [
            (1, "https://a.example/q"),          # no match: kept
            (2, "https://a.example/p/x"),        # /p: dropped
            (3, "https://a.example/p/ok/yes"),   # allow /p/ok wins: kept
            (4, "https://a.example/p/ok/no/1"),  # /p/ok/no wins: dropped
            (5, "https://a.example/tie/x"),      # tie → allow: kept
        ]
        return spark.createDataFrame(rows, "doc_id long, url string")

    def test_longest_match(self, spark):
        kept = robots_filter(
            self.pages(spark), robots_rules_df(spark, self.ROBOTS)
        )
        assert sorted(r.doc_id for r in kept.collect()) == [1, 3, 5]

    def test_disallow_only_fallback_over_drops(self, spark):
        # the documented subset: every Disallow match drops, Allow
        # ignored — pages 3 and 5 (kept under precedence) drop too,
        # page 1 (no match) never does
        kept = robots_filter(
            self.pages(spark), robots_rules_df(spark, self.ROBOTS),
            precedence="disallow_only",
        )
        assert sorted(r.doc_id for r in kept.collect()) == [1]

    def test_query_string_matches(self, spark):
        # ADVICE r4 (low): RFC 9309 matches path+query —
        # 'Disallow: /index.php?action=' must fire
        pages = spark.createDataFrame(
            [
                (1, "https://a.example/index.php?action=edit"),
                (2, "https://a.example/index.php?view=1"),
                (3, "https://a.example/index.php"),
            ],
            "doc_id long, url string",
        )
        rules = robots_rules_df(
            spark,
            {"a.example": "User-agent: *\nDisallow: /index.php?action=\n"},
        )
        kept = [r.doc_id for r in robots_filter(pages, rules).collect()]
        assert sorted(kept) == [2, 3]

    def test_unparseable_host_flag(self, spark):
        # ADVICE r4 (low): schemeless URLs match no rules; default
        # keeps them, drop_unparseable=True drops them
        pages = spark.createDataFrame(
            [(1, "https://a.example/p/x"), (2, "not a url"), (3, "/rel/path")],
            "doc_id long, url string",
        )
        rules = robots_rules_df(
            spark, {"a.example": "User-agent: *\nDisallow: /p\n"}
        )
        assert sorted(
            r.doc_id for r in robots_filter(pages, rules).collect()
        ) == [2, 3]
        assert (
            robots_filter(pages, rules, drop_unparseable=True).count() == 0
        )


class TestReviewRegressions:
    def test_multi_agent_group_keeps_star_rules(self):
        # RFC 9309: consecutive User-agent lines form one group whose
        # rules apply to all listed agents, including *
        txt = "User-agent: *\nUser-agent: googlebot\nDisallow: /private\n"
        assert parse_robots(txt) == [("disallow", "/private")]
        # a NEW group after rules resets the agent list
        txt2 = (
            "User-agent: *\nDisallow: /a\n"
            "User-agent: bot\nDisallow: /b\n"
        )
        assert parse_robots(txt2) == [("disallow", "/a")]

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


class TestRound5ReviewFixes:
    def test_fragment_question_mark_is_not_a_query(self, spark):
        # 'https://h/a#sec?x' has NO query (the '?' lives in the
        # fragment); a prefix Allow '/a?x' must NOT out-rank
        # Disallow '/a' on the true target '/a'
        pages = spark.createDataFrame(
            [(1, "https://a.example/a#sec?x"), (2, "https://a.example/a?x")],
            "doc_id long, url string",
        )
        rules = robots_rules_df(
            spark, {"a.example": "User-agent: *\nDisallow: /a\nAllow: /a?x\n"}
        )
        kept = [r.doc_id for r in robots_filter(pages, rules).collect()]
        # page 1: target '/a' → disallow wins → dropped;
        # page 2: target '/a?x' → longer allow wins → kept
        assert kept == [2]


def _py_robots_decision(rules, target):
    """Independent pure-python RFC 9309 model: longest match wins,
    allow wins length ties, no match keeps."""
    best_len, best_allow = -1, True
    for rule, prefix in rules:
        if target.startswith(prefix):
            L = len(prefix)
            allow = rule == "allow"
            if L > best_len or (L == best_len and allow):
                best_len, best_allow = L, allow
    return best_allow


class TestLongestMatchProperty:
    def test_random_rule_sets_match_python_model(self, spark):
        """Hypothesis-style randomized differential: the Spark array-
        expression verdict equals an independent python longest-match
        model over random rule sets and paths (one DataFrame round
        trip for all cases)."""
        import random

        rng = random.Random(20260818)
        segs = ["/a", "/b", "/ab", "/a/b", "/a?x", "/abc"]
        cases = []  # (case_id, host, rules, target_path)
        for i in range(300):
            host = f"h{i}.example"
            n_rules = rng.randrange(1, 6)
            rules = [
                (rng.choice(["allow", "disallow"]),
                 "".join(rng.sample(segs, rng.randrange(1, 3))))
                for _ in range(n_rules)
            ]
            path = "".join(rng.sample(segs, rng.randrange(1, 4)))
            cases.append((i, host, rules, path))
        pages = spark.createDataFrame(
            [(i, f"https://{host}{path}") for i, host, _r, path in cases],
            "doc_id long, url string",
        )
        rules_df = spark.createDataFrame(
            [
                (host, rule, prefix)
                for _i, host, rules, _p in cases
                for rule, prefix in rules
            ],
            "host string, rule string, prefix string",
        )
        kept = {
            r.doc_id for r in robots_filter(pages, rules_df).collect()
        }
        for i, _host, rules, path in cases:
            want = _py_robots_decision(rules, path)
            assert (i in kept) == want, (i, rules, path)
