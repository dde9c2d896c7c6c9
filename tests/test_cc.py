"""Connected components: correctness on chains, stars, and singletons."""

from __future__ import annotations

from bop_consus_importing_rdf_spark.kg.cc import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.component for r in connected_components(df).collect()}


def test_single_edge(spark):
    assert _cc(spark, [("b", "a")]) == {"a": "a", "b": "a"}


def test_chain_converges(spark):
    # long chain exercises pointer doubling (would need 8 naive iterations)
    chain = [(f"n{i}", f"n{i+1}") for i in range(9)]
    got = _cc(spark, chain)
    assert set(got.values()) == {"n0"}
    assert len(got) == 10


def test_two_components(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == "x"


def test_cycle(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert set(got.values()) == {"a"}

