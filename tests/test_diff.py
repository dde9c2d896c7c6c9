"""harvest_diff: snapshot change detection over canonical-hash tables."""

from __future__ import annotations

from bop_consus_importing_rdf_spark.operators.diff import harvest_diff


def test_harvest_diff_all_statuses(spark):
    old = spark.createDataFrame(
        [("a", "h1"), ("b", "h2"), ("c", "h3")],
        "dataset_id string, content_hash string",
    )
    new = spark.createDataFrame(
        [("a", "h1"), ("b", "h2-modified"), ("d", "h4")],
        "dataset_id string, content_hash string",
    )
    got = {
        r["dataset_id"]: (r["status"], r["old_hash"], r["new_hash"])
        for r in harvest_diff(old, new).collect()
    }
    assert got == {
        "a": ("unchanged", "h1", "h1"),
        "b": ("changed", "h2", "h2-modified"),
        "c": ("removed", "h3", None),
        "d": ("added", None, "h4"),
    }


def test_harvest_diff_custom_columns(spark):
    old = spark.createDataFrame([(1, "x")], "id long, h string")
    new = spark.createDataFrame([(1, "y")], "id long, h string")
    rows = harvest_diff(old, new, id_col="id", hash_col="h").collect()
    assert [(r["dataset_id"], r["status"]) for r in rows] == [(1, "changed")]
