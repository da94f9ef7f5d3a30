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


class TestTokenRelex:
    """Token-mode JOINT relex (UniEncoderTokenRelexGLiNER analog,
    gliner/model.py:2902): candidate proposal from BIO flags + the
    span-relex tail + TokenRelexDecoder semantics."""

    RELS = ["works_at", "located_in"]

    def _pipe(self, **kw):
        cfg = dict(
            threshold=0.4, adjacency_threshold=0.35,
            relation_threshold=0.2, mode="token",
        )
        cfg.update(kw)
        return GLiNERPipeline(LABELS, self.RELS, PipelineConfig(**cfg))

    def test_emits_relations_with_byte_identical_text(self):
        pipe = self._pipe()
        n_rels = 0
        for r in synth_pages(N):
            ents, rels = pipe.predict_triples(r["text"], r["lang"])
            for rel in rels:
                n_rels += 1
                h, t = rel["head"], rel["tail"]
                assert r["text"][h["start"]:h["end"]] == h["text"]
                assert r["text"][t["start"]:t["end"]] == t["text"]
                assert rel["relation"] in self.RELS
                # head/tail indices point into the POST-greedy entity list
                assert ents[h["entity_idx"]]["text"] == h["text"]
                assert ents[t["entity_idx"]]["text"] == t["text"]
        assert n_rels > 0  # non-vacuous on the synthetic corpus

    def test_relations_respect_thresholds(self):
        lax = self._pipe()
        strict = self._pipe(relation_threshold=0.99)
        text = next(iter(synth_pages(5)))["text"]
        _, rels_lax = lax.predict_triples(text)
        _, rels_strict = strict.predict_triples(text)
        assert len(rels_strict) <= len(rels_lax)
        assert all(r["score"] > 0.2 for r in rels_lax)

    def test_differs_from_span_mode_relex(self):
        """The token route must be a genuinely different path than the
        span-enumeration relex (different candidate proposal)."""
        token = self._pipe()
        span = GLiNERPipeline(
            LABELS, self.RELS,
            PipelineConfig(
                threshold=0.4, adjacency_threshold=0.35,
                relation_threshold=0.2,
            ),
        )
        tok_all, span_all = [], []
        for r in synth_pages(N):
            tok_all.append(token.predict_triples(r["text"])[1])
            span_all.append(span.predict_triples(r["text"])[1])
        assert tok_all != span_all

    def test_session_without_relex_graph_raises(self):
        """A span-only token session can't serve triples: the pipeline
        rejects it eagerly at construction (supports_relations gate)."""
        from gliner_spark.model.onnx_backend import OnnxTokenEncoder
        from gliner_spark.model.ort_testing import FakeTokenSession

        with pytest.raises(ValueError, match="relex-capable"):
            GLiNERPipeline(
                LABELS, self.RELS, PipelineConfig(threshold=0.4, mode="token"),
                encoder=OnnxTokenEncoder(session=FakeTokenSession()),
            )

    def test_tokenrelex_session_batch_matches_per_doc(self):
        from gliner_spark.model.ort_testing import fake_token_relex_encoder_factory

        pipe = GLiNERPipeline(
            LABELS, self.RELS, PipelineConfig(threshold=0.5, mode="token"),
            encoder=fake_token_relex_encoder_factory(),
        )
        texts = [r["text"] for r in synth_pages(25)]
        batch = pipe.predict_triples_batch(texts)
        single = [pipe.predict_triples(t) for t in texts]
        assert batch == single
        assert any(rels for _ents, rels in batch)  # non-vacuous
