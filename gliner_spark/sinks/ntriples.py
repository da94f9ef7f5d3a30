"""N-Triples export: the extracted KG in the RDF interchange format.

Downstream consumers of a KG build (triple stores, SPARQL engines,
RDF toolchains) ingest N-Triples; this sink renders the triple table
into spec-valid lines with pure string expressions — JVM-side,
shuffle-free, and exactly reproducible by a SQL oracle:

* entity/predicate IRIs are ``<base>e/<md5(surface)>`` — md5 because
  percent-encoding arbitrary web text into a valid IRI inside a
  column expression is where exporters go wrong (and md5 is the one
  hash Spark, DuckDB, and Python agree on byte-for-byte, which keeps
  the gate hash-exact);
* the surface forms are preserved as ``rdfs:label``-style literal
  lines with the spec's ECHAR escaping (backslash, quote, newline,
  carriage return, tab) so nothing is lost to the hashing;
* one output column ``line``; write with ``.write.text(path)``.

Reference anchor: the reference emits triples as python dicts
(gliner/model.py inference outputs); the serialization surface is
net-new scale tooling, like the graph-table sink it complements
(sinks/graph.py stores the queryable parquet form, this exports the
interchange form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def escape_literal(c: Column) -> Column:
    """N-Triples ECHAR escaping for literal bodies: backslash first,
    then quote, newline, carriage return, tab."""
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', r'\\"')
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return c


def _iri(kind, surface: Column, base: str) -> Column:
    """IRI column ``<base><kind>/<md5(surface)>``; ``kind`` is a
    constant string or a per-row Column."""
    if isinstance(kind, str):
        return F.concat(
            F.lit(f"<{base}{kind}/"), F.md5(surface), F.lit(">")
        )
    return F.concat(
        F.lit(f"<{base}"), kind, F.lit("/"), F.md5(surface), F.lit(">")
    )


def ntriples_lines(
    triples: DataFrame,
    base: str = "http://kg.example/",
    subj_col: str = "subj_text",
    pred_col: str = "pred",
    obj_col: str = "obj_text",
) -> DataFrame:
    """One ``line`` column: the relation statements plus one label
    statement per distinct surface form (entities AND predicates), so
    the export is lossless and self-describing. Deterministic set of
    lines — duplicates collapsed — and shuffle cost is one distinct
    per statement class over uniform md5-derived keys.
    """
    s, p, o = F.col(subj_col), F.col(pred_col), F.col(obj_col)
    # a null component cannot be rendered as a valid statement —
    # concat_ws would silently SKIP it and emit a truncated line that
    # parses wrong (a null pred promotes the object to predicate);
    # such rows are excluded from both statement classes
    triples = triples.where(s.isNotNull() & p.isNotNull() & o.isNotNull())
    rel = triples.select(
        F.concat_ws(
            " ",
            _iri("e", s, base),
            _iri("p", p, base),
            _iri("e", o, base),
            F.lit("."),
        ).alias("line")
    ).distinct()
    label_src = (
        triples.select(F.lit("e").alias("k"), s.alias("t"))
        .unionByName(triples.select(F.lit("e").alias("k"), o.alias("t")))
        .unionByName(triples.select(F.lit("p").alias("k"), p.alias("t")))
        .distinct()
    )
    labels = label_src.select(
        F.concat_ws(
            " ",
            _iri(F.col("k"), F.col("t"), base),
            F.lit("<http://www.w3.org/2000/01/rdf-schema#label>"),
            F.concat(F.lit('"'), escape_literal(F.col("t")), F.lit('"')),
            F.lit("."),
        ).alias("line")
    )
    return rel.unionByName(labels)


def write_ntriples(
    triples: DataFrame,
    path: str,
    base: str = "http://kg.example/",
    **cols,
) -> None:
    """Materialize the export as text files at ``path``."""
    ntriples_lines(triples, base=base, **cols).write.mode(
        "overwrite"
    ).text(path)
