"""N-Triples export sink: spec escaping, losslessness, line validity."""

import re

from pyspark.sql import functions as F

from gliner_spark.sinks.ntriples import escape_literal, ntriples_lines, write_ntriples

TRIPLES = [
    ("john smith", "works_at", "acme corporation"),
    ("john smith", "lives_in", "new york"),
    ('weird "quoted" \\ name\nwith newline\tand tab', "works_at", "acme corporation"),
]


def tdf(spark):
    return spark.createDataFrame(
        TRIPLES, "subj_text string, pred string, obj_text string"
    )


LINE_RE = re.compile(
    r"^<[^<>\s]+> <[^<>\s]+> (<[^<>\s]+>|\"(?:[^\"\\]|\\.)*\") \.$"
)


class TestNTriples:
    def test_every_line_is_spec_valid(self, spark):
        lines = [r.line for r in ntriples_lines(tdf(spark)).collect()]
        assert len(lines) > 0
        for line in lines:
            assert LINE_RE.match(line), line

    def test_relations_and_labels_lossless(self, spark):
        lines = [r.line for r in ntriples_lines(tdf(spark)).collect()]
        rel = [l for l in lines if "rdf-schema#label" not in l]
        lab = [l for l in lines if "rdf-schema#label" in l]
        # 3 distinct relation statements; labels for 4 distinct
        # entities + 2 distinct predicates
        assert len(rel) == 3 and len(lab) == 6
        # every IRI appearing in a relation statement has a label line
        iris_in_rel = {m for l in rel for m in re.findall(r"<[^>]+>", l)}
        iris_labeled = {re.match(r"^(<[^>]+>)", l).group(1) for l in lab}
        assert iris_in_rel <= iris_labeled
        # the escaped literal decodes back to the original surface
        esc_map = {}
        for l in lab:
            body = re.search(r'"((?:[^"\\]|\\.)*)"', l).group(1)
            decoded = (
                body.replace("\\n", "\n").replace("\\r", "\r")
                .replace("\\t", "\t").replace('\\"', '"')
                .replace("\\\\", "\\")
            )
            esc_map[decoded] = True
        surfaces = {s for s, _, _ in TRIPLES} | {o for _, _, o in TRIPLES} | {
            p for _, p, _ in TRIPLES
        }
        assert surfaces <= set(esc_map)

    def test_escape_order_backslash_first(self, spark):
        # a literal backslash-n sequence must NOT double-escape into \\n
        got = spark.createDataFrame([("a\\nb",)], "t string").select(
            escape_literal(F.col("t")).alias("e")
        ).first().e
        assert got == "a\\\\nb"  # backslash doubled, 'n' untouched

    def test_write_text_round_trip(self, spark, tmp_path):
        out = str(tmp_path / "nt")
        write_ntriples(tdf(spark), out)
        back = {r.value for r in spark.read.text(out).collect()}
        want = {r.line for r in ntriples_lines(tdf(spark)).collect()}
        assert back == want
