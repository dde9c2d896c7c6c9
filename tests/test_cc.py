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


def test_corrupt_triples_deterministic_and_filtered(spark):
    from bop_consus_importing_rdf_spark.kg.negatives import corrupt_triples

    t = spark.createDataFrame(
        [("s1", "p", "e1"), ("s2", "p", "e2"), ("s3", "p", "e3")],
        "subj string, pred string, obj string",
    )
    out1 = sorted(map(tuple, corrupt_triples(t, k=4).collect()))
    out2 = sorted(map(tuple, corrupt_triples(t, k=4).collect()))
    assert out1 == out2  # md5-derived: reproducible across runs
    # no negative equals its positive object, pool membership holds
    for subj, pred, neg, j in out1:
        assert neg in {"e1", "e2", "e3"}
        assert 0 <= j < 4
    pos = {("s1", "e1"), ("s2", "e2"), ("s3", "e3")}
    assert all((s, n) not in pos for s, _, n, _ in out1)
    # each triple yields AT MOST k negatives (collisions dropped)
    from collections import Counter
    per = Counter(s for s, *_ in out1)
    assert all(v <= 4 for v in per.values()) and set(per) <= {"s1", "s2", "s3"}


def test_corrupt_triples_explicit_pool(spark):
    from bop_consus_importing_rdf_spark.kg.negatives import corrupt_triples

    t = spark.createDataFrame([("s", "p", "o")], "subj string, pred string, obj string")
    pool = spark.createDataFrame([("x",), ("y",)], "entity string")
    rows = corrupt_triples(t, k=6, entities=pool).collect()
    assert rows and {r["neg_obj"] for r in rows} <= {"x", "y"}
    assert len(rows) == 6  # 'o' not in pool: nothing filtered


def test_cooccurrence_pmi_matches_python_reference(spark):
    import math
    from collections import Counter
    from itertools import combinations

    from bop_consus_importing_rdf_spark.kg.cooccur import cooccurrence_pmi

    docs = {
        1: {"a", "b", "c"},
        2: {"a", "b"},
        3: {"a"},
        4: {"c", "d"},
    }
    rows = [(i, e) for i, es in docs.items() for e in es]
    # duplicate mention rows must not inflate counts (distinct semantics)
    rows += [(1, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "doc_id long, entity string")
    got = {
        (r["entity_a"], r["entity_b"]): (r["n_pairs"], r["pmi_q"])
        for r in cooccurrence_pmi(df).collect()
    }

    n = len(docs)
    ce = Counter(e for es in docs.values() for e in es)
    cab = Counter(
        p for es in docs.values() for p in combinations(sorted(es), 2)
    )
    want = {
        p: (c, math.floor(1e6 * math.log((n * c) / (ce[p[0]] * ce[p[1]]))))
        for p, c in cab.items()
    }
    assert got == want
    # sanity: (a, b) co-occur twice and should outrank chance
    assert got[("a", "b")][0] == 2
