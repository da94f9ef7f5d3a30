"""Token-mode pipeline (start/end/inside scorer + span-assembly decode,
reference M7/D5) — wiring + distributed parity."""

import pytest

from gliner_spark.model.pipeline import GLiNERPipeline, PipelineConfig
from gliner_spark.operators.extract import extract_entities
from gliner_spark.sources.pages import pages_df, synth_pages

LABELS = ["person", "organization", "location"]
N = 60


def local_token_entities():
    pipe = GLiNERPipeline(
        LABELS, [], PipelineConfig(threshold=0.5, mode="token")
    )
    out = {}
    for r in synth_pages(N):
        out[r["url"]] = pipe.predict_entities(r["text"], r["lang"])
    return out


class TestTokenMode:
    def test_produces_valid_char_spans(self):
        ents = local_token_entities()
        texts = {r["url"]: r["text"] for r in synth_pages(N)}
        n_total = 0
        for url, es in ents.items():
            for e in es:
                n_total += 1
                assert texts[url][e["start"]:e["end"]] == e["text"]
                assert 0.5 < e["score"] <= 1.0
        assert n_total > 0  # deterministic encoder finds some spans

    def test_score_is_min_of_start_end_inside(self):
        """The span score can never exceed any of its constituent
        probabilities (the min rule, decoder.py:1021)."""
        import numpy as np

        from gliner_spark.kernel.decoding import sigmoid

        pipe = GLiNERPipeline(
            LABELS, [], PipelineConfig(threshold=0.5, mode="token")
        )
        r = next(x for x in synth_pages(N) if len(x["text"].split()) > 8)
        tokens, starts, ends = pipe._prepare(r["text"], r["lang"])
        probs = sigmoid(
            pipe.encoder.token_label_scores(
                pipe.encoder.embed_tokens(tokens), pipe.label_embs
            )
        )
        for e in pipe.predict_entities(r["text"], r["lang"]):
            ws = starts.index(e["start"])
            we = ends.index(e["end"])
            c = LABELS.index(e["label"])
            bound = min(
                float(probs[ws:we + 1, c, 2].min()),
                float(probs[ws, c, 0]),
                float(probs[we, c, 1]),
            )
            assert e["score"] == pytest.approx(bound)

    def test_spark_matches_local(self, spark):
        expected = local_token_entities()
        got = extract_entities(
            pages_df(spark, N), LABELS, threshold=0.5, mode="token"
        ).collect()
        by_url = {}
        for row in got:
            by_url.setdefault(row.url, []).append(
                (row.start, row.end, row.label, row.score)
            )
        exp_flat = {
            url: sorted((e["start"], e["end"], e["label"], e["score"]) for e in es)
            for url, es in expected.items() if es
        }
        got_flat = {url: sorted(v) for url, v in by_url.items()}
        assert got_flat == exp_flat
