"""Unit tests for gliner_spark.functions (text + vectors)."""

import pytest

from pyspark.sql import Row, functions as F

from gliner_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint_agg,
    lang_id_column,
    quality_columns,
    regex_token_count,
    shingles,
    simhash_column,
    stopword_count,
    word_count,
)
from gliner_spark.functions.vectors import cosine_similarity, dot_product, sign_bucket
from gliner_spark.operators.dedup import simhash_table


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today ok"),
            (1, "a b c d e f g h i j"),
            (2, "spark table scan fast fast fast table spark scan scan"),
        ],
        "doc_id long, text string",
    )


class TestTextFunctions:
    def test_token_counts(self, tdf):
        row = (
            tdf.where("doc_id = 0")
            .select(
                word_count(F.col("text")).alias("w"),
                regex_token_count(F.col("text")).alias("r"),
                bpe_ish_token_count(F.col("text")).alias("b"),
            )
            .first()
        )
        assert row.w == 11 and row.r == 11 and row.b == 11

    def test_bpe_splits_punct_and_digits(self, spark):
        df = spark.createDataFrame([("ab1 c-d!",)], "text string")
        row = df.select(
            regex_token_count(F.col("text")).alias("r"),
            bpe_ish_token_count(F.col("text")).alias("b"),
        ).first()
        # \w+ → ["ab1", "c-d"... no: "c", "d" separated by '-'] = ab1,c,d → 3
        assert row.r == 3
        # bpe-ish → ab,1,c,-,d,! → 6
        assert row.b == 6

    def test_stopword_count_multiplicity(self, tdf):
        row = tdf.where("doc_id = 0").select(
            stopword_count(F.col("text")).alias("s")
        ).first()
        assert row.s == 2  # 'the' twice

    def test_quality_ratios_exact(self, tdf):
        cols = quality_columns(F.col("text"))
        row = (
            tdf.where("doc_id = 1")
            .select(*[c.alias(n) for n, c in cols.items()])
            .first()
        )
        assert row.n_words == 10
        assert row.n_stop == 1  # 'a'
        assert row.stop_ratio == 1 / 10
        assert row.mean_word_len == 1.0
        assert bool(row.quality_keep) is True

    def test_lang_id_tie_break_order(self, spark):
        # no markers at all → every score 0 → first declared lang wins
        df = spark.createDataFrame([("zzz yyy xxx",)], "text string")
        assert df.select(lang_id_column(F.col("text")).alias("l")).first().l == "en"

    def test_shingles_distinct_and_ordered(self, tdf):
        row = tdf.where("doc_id = 2").select(
            shingles(F.col("text")).alias("sh")
        ).first()
        assert "spark table scan" in row.sh
        assert len(row.sh) == len(set(row.sh))

    def test_shingle_hashes_mirror_string_shingles(self, spark):
        """The allocation-free hashed shingles must be a faithful
        image of the string shingles: same count per doc (distinct
        grams ↔ distinct hashes), equal grams ↔ equal hashes ACROSS
        docs (the join contract), and the same short-doc empty-array
        guard."""
        from gliner_spark.functions.text import shingle_hashes

        rows = [
            (1, "w1 w2 w3 w4 w1 w2 w3"),   # repeated gram inside doc
            (2, "x w1 w2 w3 y"),            # shares 'w1 w2 w3' with 1
            (3, "only two"),                # shorter than n → empty
            (4, None),                      # null text
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.sh, r.hh)
            for r in df.select(
                "doc_id",
                shingles(F.col("text")).alias("sh"),
                shingle_hashes(F.col("text")).alias("hh"),
            ).collect()
        }
        # same cardinality everywhere; short and null docs both hit
        # the when-guard and come back as EMPTY arrays in both forms
        for d in (1, 2, 3, 4):
            assert len(got[d][0]) == len(got[d][1])
        assert got[3][0] == [] and got[3][1] == []
        assert got[4][0] == [] and got[4][1] == []
        # equal grams map to equal hashes across docs, unequal to unequal
        gram_to_hash = {}
        for d in (1, 2):
            for g, h in zip(*got[d]):
                assert gram_to_hash.setdefault(g, h) == h
        assert len(set(gram_to_hash.values())) == len(gram_to_hash)

    def test_fingerprint_deterministic_and_sensitive(self, tdf):
        fps = {
            r.doc_id: r.fp
            for r in tdf.select(
                "doc_id", fingerprint_agg(F.col("text")).alias("fp")
            ).collect()
        }
        assert fps[0] != fps[1] != fps[2]
        assert all(len(fp.split("-")) == 4 for fp in fps.values())

    def test_simhash_column_matches_simhash_table(self, tdf):
        """The zero-shuffle array-expression SimHash and the explode+agg
        scale path must produce identical hashes."""
        a = {
            r.doc_id: r.sh
            for r in tdf.select(
                "doc_id", simhash_column(F.col("text"), 32, ngram=3).alias("sh")
            ).collect()
        }
        b = {r._id: r.sh for r in simhash_table(tdf, bits=32, ngram=3).collect()}
        assert a == b


class TestVectorFunctions:
    def test_dot_and_cosine(self, spark):
        df = spark.createDataFrame(
            [([1.0, 0.0, 1.0], [1.0, 1.0, 0.0])], "a array<float>, b array<float>"
        )
        row = df.select(
            dot_product(F.col("a"), F.col("b")).alias("d"),
            cosine_similarity(F.col("a"), F.col("a")).alias("self_cos"),
        ).first()
        assert row.d == 1.0
        assert row.self_cos == pytest.approx(1.0)

    def test_sign_bucket(self, spark):
        df = spark.createDataFrame(
            [([1.0, -1.0, 2.0, -0.5, 1.0, 1.0, -1.0, 1.0],)], "v array<float>"
        )
        # bits set at i=0,2,4,5,7 → 1+4+16+32+128
        assert df.select(sign_bucket(F.col("v"), 8).alias("b")).first().b == 181


class TestTopTerms:
    def test_counts_rank_and_tie_order(self, spark):
        from gliner_spark.functions.text import top_terms

        docs = spark.createDataFrame(
            [
                ("b b b a a c", "en"),
                ("a c", "en"),
                ("x y", "de"),
            ],
            ["text", "lang"],
        )
        got = {
            (r["lang"], r["rank"]): (r["term"], r["n"])
            for r in top_terms(docs, k=2).collect()
        }
        # en: a=3, b=3 (tie -> 'a' first lexicographically), c=2 cut at k=2
        assert got[("en", 1)] == ("a", 3)
        assert got[("en", 2)] == ("b", 3)
        assert ("en", 3) not in got
        assert got[("de", 1)] == ("x", 1)

    def test_two_phase_prune_is_lossless(self, spark):
        """Top-k through the bucketed prune equals a naive global top-k."""
        import random

        from pyspark.sql import Window, functions as F

        from gliner_spark.functions.text import top_terms

        rng = random.Random(5)
        vocab = [f"w{i}" for i in range(120)]
        docs = [
            (" ".join(rng.choices(vocab, k=60)), rng.choice(["en", "de"]))
            for _ in range(50)
        ]
        df = spark.createDataFrame(docs, ["text", "lang"])
        got = sorted(map(tuple, top_terms(df, k=7).collect()))
        naive = (
            df.select(
                F.col("lang"), F.explode(F.split("text", " ")).alias("term")
            )
            .where(F.length("term") >= 1)
            .groupBy("lang", "term")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("term"))
                ),
            )
            .where(F.col("rank") <= 7)
        )
        assert got == sorted(map(tuple, naive.collect()))

    def test_empty_tokens_excluded(self, spark):
        from gliner_spark.functions.text import top_terms

        df = spark.createDataFrame([("a  a", "en")], ["text", "lang"])
        rows = top_terms(df).collect()
        assert [(r["term"], r["n"]) for r in rows] == [("a", 2)]


def test_simhash_null_text_is_zero(spark):
    """NULL text → signature 0 (the pre-round-4 per-bit form coerced
    null votes to 0; a NULL signature would silently drop the row from
    every band/XOR comparison)."""
    from gliner_spark.functions.text import simhash_column

    df = spark.createDataFrame([(1, None), (2, "")], "id int, text string")
    got = {r.id: r.sh for r in df.select(
        "id", simhash_column(F.col("text"), 32).alias("sh")
    ).collect()}
    assert got[1] == 0
    # empty string tokenizes to [""] and hashes like any one-token doc
    # (unchanged pre-round-4 semantics) — non-null either way
    assert got[2] is not None


class TestPii:
    CASES = [
        ("mail me at a.b+c@sub.example.org please",
         "mail me at <EMAIL> please", 1, 0, 0),
        ("server 192.168.0.1 and 10.0.0.255 down",
         "server <IP> and <IP> down", 0, 2, 0),
        ("call +1 (555) 123-4567 today",
         "call <PHONE> today", 0, 0, 1),
        ("id 12345678901 listed",  # plain long digit run: phone-like
         "id <PHONE> listed", 0, 0, 1),
        ("version 1.2.3 of lib x", "version 1.2.3 of lib x", 0, 0, 0),
        ("email bob@x.io or 8.8.8.8 or 555-123-9876",
         "email <EMAIL> or <IP> or <PHONE>", 1, 1, 1),
    ]

    def test_redaction_and_counts(self, spark):
        from gliner_spark.functions.pii import pii_columns

        df = spark.createDataFrame(
            [(i, t) for i, (t, *_ ) in enumerate(self.CASES)],
            "id int, text string",
        )
        cols = pii_columns(F.col("text"))
        got = {
            r.id: r
            for r in df.select(
                "id", *[c.alias(n) for n, c in cols.items()]
            ).collect()
        }
        for i, (_, want_red, ne, ni, np_) in enumerate(self.CASES):
            r = got[i]
            assert r.redacted_text == want_red, i
            assert (r.n_emails, r.n_ips, r.n_phones) == (ne, ni, np_), i
            assert r.has_pii == ((ne + ni + np_) > 0)
