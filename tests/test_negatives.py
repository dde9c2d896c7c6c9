"""corrupt_triples: reproducible KG-embedding negative sampling."""

from __future__ import annotations


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


def test_corrupt_triples_rejects_nonpositive_k(spark):
    import pytest

    from bop_consus_importing_rdf_spark.kg.negatives import corrupt_triples

    t = spark.createDataFrame(
        [("s", "p", "o")], "subj string, pred string, obj string"
    )
    with pytest.raises(ValueError, match="k must be >= 1"):
        corrupt_triples(t, k=0)
