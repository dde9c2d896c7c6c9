"""A1-A3, J4, S8: counter, totals, duplicate warnings, manifest."""

from __future__ import annotations

from bop_consus_importing_rdf_spark.operators.manifest import (
    duplicate_warnings,
    manifest,
    resolve_total,
    with_counter,
)


def _datasets(spark):
    rows = [
        ("cat-a", "http://e/ds1", "id-1", "doc-1"),
        ("cat-a", "http://e/ds2", "dup", "doc-1"),
        ("cat-a", "http://e/ds3", "dup", "doc-2"),
        ("cat-b", "http://e/ds4", "id-4", "doc-3"),
    ]
    return spark.createDataFrame(
        rows, "catalogue string, subj string, identifier string, doc_id string"
    )


def test_counter_is_deterministic_and_dense(spark):
    out = with_counter(_datasets(spark))
    got = {
        (r.catalogue, r.identifier, r.subj): r.counter for r in out.collect()
    }
    assert got[("cat-a", "dup", "http://e/ds2")] == 1
    assert got[("cat-a", "dup", "http://e/ds3")] == 2
    assert got[("cat-a", "id-1", "http://e/ds1")] == 3
    assert got[("cat-b", "id-4", "http://e/ds4")] == 1


def test_duplicates_warned_but_kept(spark):
    ds = _datasets(spark)
    warns = duplicate_warnings(ds).collect()
    assert len(warns) == 1
    assert warns[0].identifier == "dup" and warns[0].n_occurrences == 2
    assert ds.count() == 4  # nothing dropped


def test_resolve_total_prefers_hydra(spark):
    ds = _datasets(spark)
    doc_totals = spark.createDataFrame(
        [("doc-1", 100), ("doc-2", 0), ("doc-3", None)],
        "doc_id string, hydra_total int",
    )
    out = {r.subj: r.total for r in resolve_total(ds, doc_totals).collect()}
    assert out["http://e/ds1"] == 100  # hydra wins
    assert out["http://e/ds3"] == 1    # hydra 0 → actual per-doc count
    assert out["http://e/ds4"] == 1    # hydra null → actual


def test_manifest_order_and_duplicates(spark):
    out = manifest(with_counter(_datasets(spark)))
    rows = {r.catalogue: r.identifiers for r in out.collect()}
    assert rows["cat-a"] == ["dup", "dup", "id-1"]
    assert rows["cat-b"] == ["id-4"]
