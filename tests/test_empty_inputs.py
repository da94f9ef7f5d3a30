"""Empty-input robustness: every operator must return an empty result
with the right schema, not crash, when the corpus is empty (a real
condition at scale: empty partitions, fully-filtered chunks)."""

import pytest

from gliner_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from gliner_spark.operators.extract import extract_entities, extract_triples
from gliner_spark.operators.multitask import classify_documents
from gliner_spark.operators.similarity import brute_force_topk


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def empty_pages(spark):
    return spark.createDataFrame([], "url string, text string, lang string")


class TestEmptyInputs:
    def test_extraction(self, empty_pages):
        ents = extract_entities(empty_pages, ["person"])
        assert ents.count() == 0
        assert set(ents.columns) == {"url", "start", "end", "text", "label", "score"}
        assert extract_triples(empty_pages, ["person"], ["r"]).count() == 0

    def test_dedup_suite(self, empty_docs):
        assert exact_duplicates(empty_docs).count() == 0
        assert ngram_jaccard_pairs(empty_docs).count() == 0
        assert minhash_lsh_pairs(empty_docs).count() == 0
        assert simhash_pairs(empty_docs).count() == 0

    def test_similarity(self, spark):
        empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
        assert brute_force_topk(empty, empty).count() == 0

    def test_multitask(self, empty_pages):
        assert classify_documents(empty_pages, ["a", "b"]).count() == 0

    def test_all_blank_text_rows(self, spark):
        pages = spark.createDataFrame(
            [("u0", "", "en"), ("u1", "   \t", "en")],
            "url string, text string, lang string",
        )
        assert extract_entities(pages, ["person"]).count() == 0
