"""PageRank: integer-quantized power iteration vs a pure-Python reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.kg.pagerank import pagerank


def _py_pagerank(edges, iters, scale):
    """Independent reference: same recurrence, same integer arithmetic."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    rank = {n: scale for n in nodes}
    teleport = 15 * scale // 100
    for _ in range(iters):
        in_sum = {n: 0 for n in nodes}
        for u, v in edges:
            in_sum[v] += rank[u] // deg[u]
        rank = {n: teleport + (85 * in_sum[n]) // 100 for n in nodes}
    return rank


def _run(spark, edges, iters=5, scale=10**9):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank_q"]
        for r in pagerank(df, iters=iters, scale=scale).collect()
    }
    assert got == _py_pagerank(edges, iters, scale)
    return got


def test_pagerank_matches_python_reference(spark):
    # hub-and-spoke plus a chain and a dangling sink
    edges = [
        ("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"),
        ("a", "b"), ("b", "c"), ("c", "sink"),
    ]
    got = _run(spark, edges)
    # the hub out-ranks every spoke; the dangling sink absorbs rank
    assert got["hub"] == max(got.values())
    assert got["sink"] > 15 * 10**9 // 100  # more than bare teleport


def test_pagerank_cycle_is_symmetric(spark):
    # a pure cycle: every node has identical in/out structure, so after
    # any number of iterations all ranks are exactly equal
    edges = [("n0", "n1"), ("n1", "n2"), ("n2", "n0")]
    got = _run(spark, edges, iters=7)
    assert len(set(got.values())) == 1


def test_pagerank_no_inlinks_is_teleport_only(spark):
    edges = [("lonely", "popular"), ("other", "popular")]
    got = _run(spark, edges, iters=3)
    teleport = 15 * 10**9 // 100
    # sources with no in-edges settle at exactly the teleport term
    assert got["lonely"] == teleport
    assert got["other"] == teleport
    assert got["popular"] > teleport
