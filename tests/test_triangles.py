"""Degree-ordered triangle counting vs brute-force reference."""

from __future__ import annotations

import random
from itertools import combinations

import pytest

from bop_consus_importing_rdf_spark.kg.triangles import triangle_counts


def _ref_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ref: dict = {}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                ref[n] = ref.get(n, 0) + 1
    return ref


def test_triangles_hand_cases(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),      # one triangle
        ("c", "d"),                               # dangling edge
        ("a", "a"),                               # self-loop dropped
        ("b", "a"), ("a", "b"),                   # reverse + parallel dup
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


@pytest.mark.parametrize("seed,n_part", [(1, 1), (17, 5), (59, 32)])
def test_triangles_randomized_vs_reference(spark, seed, n_part):
    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(40)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(300)]
    df = spark.createDataFrame(
        edges, "src string, dst string"
    ).repartition(n_part)
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == _ref_triangles(edges)


def test_triangles_hub_star_is_triangle_free(spark):
    # the "last reducer" shape: one hub connected to everything — a naive
    # unoriented wedge count enumerates deg² pairs at the hub; the
    # oriented plan emits ZERO wedges at it (hub sorts last) and the
    # answer is empty
    edges = [("hub", f"leaf{i}") for i in range(500)]
    df = spark.createDataFrame(edges, "src string, dst string")
    assert triangle_counts(df).count() == 0


# --- random walks (kg/walks.py) -------------------------------------------

def test_graph_random_walks_vs_reference(spark):
    import hashlib

    from bop_consus_importing_rdf_spark.kg.walks import graph_random_walks

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
             ("a", "b")]  # parallel edge collapses
    df = spark.createDataFrame(
        edges, "src string, dst string"
    ).repartition(4)
    got = sorted(
        tuple(r)
        for r in graph_random_walks(df, walk_len=3, walks_per_node=2)
        .collect()
    )
    adj: dict = {}
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)

    def idx(*parts):
        key = "|".join(map(str, parts)).encode()
        return int(hashlib.md5(key).hexdigest()[:8], 16)

    ref = []
    for start in sorted(adj):
        for wid in range(2):
            cur, path = start, [start]
            for step in range(1, 4):
                if cur not in adj:
                    break  # sink: walk ends early
                nbrs = sorted(adj[cur])
                cur = nbrs[idx(start, wid, step, cur) % len(nbrs)]
                path.append(cur)
            ref.append((start, wid, " ".join(path), len(path) - 1))
    assert got == sorted(ref)


# --- k-core (kg/triangles.py::k_core) --------------------------------------

def _ref_kcore(edges, k):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(v) for n, v in adj.items()}


@pytest.mark.parametrize("seed,k", [(5, 3), (23, 2), (61, 4)])
def test_kcore_randomized_vs_reference(spark, seed, k):
    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(40)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(170)]
    df = spark.createDataFrame(
        edges, "src string, dst string"
    ).repartition(7)
    got = {
        r["node"]: r["deg"]
        for r in __import__(
            "bop_consus_importing_rdf_spark.kg.triangles",
            fromlist=["k_core"],
        ).k_core(df, k=k).collect()
    }
    assert got == _ref_kcore(edges, k)


def test_kcore_fixture_depth_below_oracle_unroll(spark):
    # the graph_kcore oracle unrolls 16 peels; pin that the fixture graph
    # (with its shortcut closure) converges well under that
    from bop_consus_importing_rdf_spark.kg.triangles import k_core
    from bop_consus_importing_rdf_spark.oracle import _graph
    from pyspark.sql import functions as F

    g = _graph(spark, "/root/testdata/sf0.001")
    e0 = g.filter(F.col("obj_kind") == "iri").select(
        F.col("subj").alias("src"), F.col("obj_value").alias("dst")
    )
    mid = e0.select(F.col("src").alias("mid"), F.col("dst"))
    sc = e0.select("src", F.col("dst").alias("mid")).join(mid, "mid") \
        .select("src", "dst")
    # converges (raises loudly past max_iter) with a tight bound
    out = k_core(e0.unionAll(sc), k=3, max_iter=12)
    assert out.count() > 0


def test_clustering_coefficients_vs_reference(spark):
    import random
    from itertools import combinations

    from bop_consus_importing_rdf_spark.kg.triangles import (
        clustering_coefficients,
    )

    rng = random.Random(3)
    nodes = [f"n{i}" for i in range(25)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (r["deg"], r["n_triangles"], r["coeff_ppm"])
        for r in clustering_coefficients(df).collect()
    }
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                tri[n] += 1
    ref = {
        n: (len(adj[n]), tri[n],
            (2 * tri[n] * 1_000_000) // (len(adj[n]) * (len(adj[n]) - 1)))
        for n in adj if len(adj[n]) >= 2
    }
    assert got == ref
