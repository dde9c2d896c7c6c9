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



def test_incremental_components_equals_recompute(spark):
    import random

    from bop_consus_importing_rdf_spark.kg.cc import (
        connected_components,
        incremental_components,
    )

    rng = random.Random(11)
    nodes = [f"n{i}" for i in range(60)]
    all_e = list(
        {
            (a, b)
            for a, b in (
                (rng.choice(nodes), rng.choice(nodes)) for _ in range(80)
            )
            if a != b
        }
    )
    # three different old/new splits, incl. delta-only-new-nodes and
    # delta-merging-many-landed-components shapes
    for frac in (0.2, 0.5, 0.8):
        k = int(len(all_e) * frac)
        old_e, new_e = all_e[:k], all_e[k:]
        odf = spark.createDataFrame(old_e or [("z1", "z2")],
                                    "src string, dst string")
        ndf = spark.createDataFrame(new_e or [("z3", "z4")],
                                    "src string, dst string")
        landed = connected_components(odf)
        inc = {
            (r.node, r.component)
            for r in incremental_components(landed, ndf).collect()
        }
        full = {
            (r.node, r.component)
            for r in connected_components(odf.unionAll(ndf)).collect()
        }
        assert inc == full, frac
