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
