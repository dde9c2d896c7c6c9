"""BGP matcher: SPARQL §18.2 conjunctive semantics on small graphs."""

from __future__ import annotations

import pytest

from bop_consus_importing_rdf_spark.operators.bgp import bgp_match

ROWS = [
    ("d1", "rdf:type", "Dataset", "iri"),
    ("d1", "title", "Alpha", "literal"),
    ("d1", "dist", "x1", "iri"),
    ("x1", "format", "CSV", "literal"),
    ("d2", "rdf:type", "Dataset", "iri"),
    ("d2", "title", "Beta", "literal"),
    ("d2", "title", "Beta2", "literal"),  # multi-valued → bag semantics
    ("loop", "p", "loop", "iri"),
]
SCHEMA = "subj string, pred string, obj_value string, obj_kind string"


@pytest.fixture()
def g(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_bgp_chain_join(spark, g):
    out = bgp_match(g, [
        ("?d", "rdf:type", "Dataset"),
        ("?d", "title", "?t"),
        ("?d", "dist", "?x"),
        ("?x", "format", "?f"),
    ])
    assert sorted(out.columns) == ["d", "f", "t", "x"]
    assert {(r["d"], r["t"], r["x"], r["f"]) for r in out.collect()} == {
        ("d1", "Alpha", "x1", "CSV")
    }


def test_bgp_bag_semantics_and_cross(spark, g):
    # multi-valued title yields two solutions for d2 (bag, not set)
    out = bgp_match(g, [("?d", "rdf:type", "Dataset"), ("?d", "title", "?t")])
    got = sorted((r["d"], r["t"]) for r in out.collect())
    assert got == [("d1", "Alpha"), ("d2", "Beta"), ("d2", "Beta2")]
    # disjoint variables → cross product of the pattern solutions
    out2 = bgp_match(g, [("?d", "rdf:type", "Dataset"), ("?x", "format", "?f")])
    assert out2.count() == 2  # 2 datasets × 1 format row


def test_bgp_intra_pattern_repeated_var(spark, g):
    assert [tuple(r) for r in bgp_match(g, [("?x", "p", "?x")]).collect()] \
        == [("loop",)]


def test_bgp_ask_guard_and_errors(spark, g):
    assert bgp_match(
        g, [("?d", "rdf:type", "Dataset"), ("d1", "title", "Alpha")]
    ).count() == 2  # guard true: both dataset solutions survive
    assert bgp_match(
        g, [("?d", "rdf:type", "Dataset"), ("d1", "title", "Nope")]
    ).count() == 0
    with pytest.raises(ValueError, match="empty BGP"):
        bgp_match(g, [])
    with pytest.raises(ValueError, match="3 terms"):
        bgp_match(g, [("?a", "?b")])
    with pytest.raises(ValueError, match="bare"):
        bgp_match(g, [("?", "p", "?x")])


def test_bgp_constant_predicates_push_down(spark, g, tmp_path):
    # constants must reach the parquet scan as pushed filters
    p = str(tmp_path / "triples")
    g.write.parquet(p)
    t = spark.read.parquet(p)
    out = bgp_match(t, [("?d", "rdf:type", "Dataset"), ("?d", "title", "?t")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "rdf:type" in plan
