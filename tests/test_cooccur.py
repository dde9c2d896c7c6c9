"""cooccurrence_pmi: PMI relatedness edges over doc-level co-mentions."""

from __future__ import annotations


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
