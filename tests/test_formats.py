"""Turtle / N-Quads / TriG / JSON-LD renderers: golden lines + JSON validity."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.functions.formats import (
    jsonld_line,
    nq_line,
    prefix_directives,
    trig_docs,
    ttl_line,
)

ROWS = [
    ("d0", "urn:ds:1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
     "http://www.w3.org/ns/dcat#Dataset", "iri", None, None),
    ("d0", "urn:ds:1", "http://purl.org/dc/terms/identifier", 'id "1"\n',
     "literal", None, None),
    ("d0", "urn:ds:1", "urn:p:priority", "high", "literal", "en", None),
    ("d0", "urn:ds:1", "urn:p:price", "42", "literal", None,
     "http://www.w3.org/2001/XMLSchema#integer"),
    ("d0", "_:b1", "urn:p:weird/pred", "urn:not-prefixed:x", "iri", None, None),
]
SCHEMA = (
    "doc_id string, subj string, pred string, obj_value string, "
    "obj_kind string, obj_lang string, obj_datatype string"
)


def _lines(df, col):
    return [r[col] for r in df.collect()]


def test_ttl_golden(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _lines(
        df.select(ttl_line(
            F.col("subj"), F.col("pred"), F.col("obj_value"),
            F.col("obj_kind"), F.col("obj_lang"), F.col("obj_datatype"),
        ).alias("l")), "l",
    )
    assert "<urn:ds:1> a dcat:Dataset ." in got
    assert '<urn:ds:1> dct:identifier "id \\"1\\"\\n" .' in got
    assert '<urn:ds:1> p:priority "high"@en .' in got
    assert '<urn:ds:1> p:price "42"^^xsd:integer .' in got
    # slash in local part → no prefixing; bnode passes through
    assert "_:b1 <urn:p:weird/pred> <urn:not-prefixed:x> ." in got
    assert "@prefix dcat: <http://www.w3.org/ns/dcat#> ." in prefix_directives()


def test_nq_and_trig(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    nq = _lines(
        df.select(nq_line(
            F.col("doc_id"), F.col("subj"), F.col("pred"), F.col("obj_value"),
            F.col("obj_kind"), F.col("obj_lang"), F.col("obj_datatype"),
        ).alias("l")), "l",
    )
    assert all(l.endswith("<urn:graph:d0> .") for l in nq)
    trig = trig_docs(df).collect()
    assert len(trig) == 1
    body = trig[0].trig
    assert body.startswith("<urn:graph:d0> {\n") and body.endswith("\n}")
    assert "<urn:ds:1> a dcat:Dataset ." in body


def test_jsonld_lines_are_valid_json(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _lines(
        df.select(jsonld_line(
            F.col("subj"), F.col("pred"), F.col("obj_value"),
            F.col("obj_kind"), F.col("obj_lang"), F.col("obj_datatype"),
        ).alias("l")), "l",
    )
    objs = [json.loads(l) for l in got]  # every line must be valid JSON
    lit = next(
        o for o in objs
        if o["@id"] == "urn:ds:1" and "http://purl.org/dc/terms/identifier" in o
    )
    assert lit["http://purl.org/dc/terms/identifier"] == [{"@value": 'id "1"\n'}]
    lang = next(o for o in objs if "urn:p:priority" in o)
    assert lang["urn:p:priority"] == [{"@value": "high", "@language": "en"}]
    typed = next(o for o in objs if "urn:p:price" in o)
    assert typed["urn:p:price"] == [
        {"@value": "42", "@type": "http://www.w3.org/2001/XMLSchema#integer"}
    ]


def test_jsonld_property_valid_json_for_arbitrary_text(spark):
    """Hypothesis: every jsonld line is parseable JSON with the exact
    original value — including raw C0 control characters, which are
    invalid in JSON strings unless \\u-escaped (the same corruption class
    the RDF/XML writer had with CR)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    any_text = st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=50,
    )

    @given(st.lists(any_text, min_size=1, max_size=6, unique=True))
    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(texts):
        rows = [
            (f"urn:s:{i}", "urn:p:x", t, "literal", None, None)
            for i, t in enumerate(texts)
        ]
        df = spark.createDataFrame(
            rows,
            "subj string, pred string, obj_value string, obj_kind string, "
            "obj_lang string, obj_datatype string",
        )
        got = _lines(
            df.select(jsonld_line(
                F.col("subj"), F.col("pred"), F.col("obj_value"),
                F.col("obj_kind"), F.col("obj_lang"), F.col("obj_datatype"),
            ).alias("l")), "l",
        )
        values = {json.loads(l)["@id"]: json.loads(l)["urn:p:x"][0]["@value"]
                  for l in got}
        assert values == {f"urn:s:{i}": t for i, t in enumerate(texts)}

    check()
