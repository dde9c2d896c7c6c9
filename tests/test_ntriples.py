"""S10/X3: N-Triples rendering incl. escaping, lang/datatype literals.

Golden expectations follow the canonical N-Triples spec; the escaping cases
mirror what Jena's N-Triples writer emits for the same terms (reference
serializes via ``Model.presentAs``, ``ImportingRdfVerticle.kt:90``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.functions.ntriples import nt_line, sql_nt_line

from .conftest import triples_df


def _render(spark, rows):
    df = triples_df(spark, rows)
    out = df.select(
        nt_line(
            F.col("subj"), F.col("pred"), F.col("obj_value"),
            F.col("obj_kind"), F.col("obj_lang"), F.col("obj_datatype"),
        ).alias("line")
    )
    return [r.line for r in out.collect()]


def test_iri_object(spark):
    assert _render(
        spark, [("urn:s", "urn:p", "urn:o", "iri")]
    ) == ["<urn:s> <urn:p> <urn:o> ."]


def test_bnode_subject_and_object(spark):
    assert _render(
        spark, [("_:b0", "urn:p", "_:b1", "bnode")]
    ) == ["_:b0 <urn:p> _:b1 ."]


def test_plain_literal(spark):
    assert _render(
        spark, [("urn:s", "urn:p", "hello", "literal")]
    ) == ['<urn:s> <urn:p> "hello" .']


def test_escaping(spark):
    value = 'a"b\\c\nd\re\tf'
    expected = '<urn:s> <urn:p> "a\\"b\\\\c\\nd\\re\\tf" .'
    assert _render(spark, [("urn:s", "urn:p", value, "literal")]) == [expected]


def test_lang_tag(spark):
    assert _render(
        spark, [("urn:s", "urn:p", "hallo", "literal", "de")]
    ) == ['<urn:s> <urn:p> "hallo"@de .']


def test_datatype(spark):
    rows = [
        ("urn:s", "urn:p", "42", "literal", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
    ]
    assert _render(spark, rows) == [
        '<urn:s> <urn:p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .'
    ]


def test_xsd_string_datatype_omitted(spark):
    rows = [
        ("urn:s", "urn:p", "x", "literal", None,
         "http://www.w3.org/2001/XMLSchema#string"),
    ]
    assert _render(spark, rows) == ['<urn:s> <urn:p> "x" .']


def test_lang_wins_over_datatype(spark):
    rows = [
        ("urn:s", "urn:p", "x", "literal", "en",
         "http://www.w3.org/2001/XMLSchema#token"),
    ]
    assert _render(spark, rows) == ['<urn:s> <urn:p> "x"@en .']


def test_sql_twin_matches_column_version(spark):
    """The portable-SQL renderer must agree with the Column renderer —
    this is what makes the DuckDB oracle a real oracle."""
    rows = [
        ("urn:s", "urn:p", 'q"uote\\slash\nnl\ttab', "literal"),
        ("urn:s", "urn:p", "urn:o", "iri"),
        ("_:b0", "urn:p", "x", "literal", "en"),
        ("urn:s", "urn:p", "3.5", "literal", None,
         "http://www.w3.org/2001/XMLSchema#double"),
        ("urn:s", "urn:p", "plain", "literal", None,
         "http://www.w3.org/2001/XMLSchema#string"),
    ]
    df = triples_df(spark, rows)
    col_lines = sorted(
        r.line for r in df.select(
            nt_line(
                F.col("subj"), F.col("pred"), F.col("obj_value"),
                F.col("obj_kind"), F.col("obj_lang"), F.col("obj_datatype"),
            ).alias("line")
        ).collect()
    )
    df.createOrReplaceTempView("nt_twin_input")
    spark_sql_lines = sorted(
        r.line
        for r in spark.sql(
            f"select {sql_nt_line()} as line from nt_twin_input"
        ).collect()
    )
    assert col_lines == spark_sql_lines

    import duckdb
    import pandas as pd

    pdf = df.toPandas()
    duck_lines = sorted(
        duckdb.sql(
            f"select {sql_nt_line()} as line from pdf"
        ).df()["line"].tolist()
    )
    assert col_lines == duck_lines
