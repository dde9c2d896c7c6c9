"""The explode fan-out guard (operators/parallelism.py).

Verdict r3 item #6: the guard must be a provable NO-OP on wide inputs and
on tiny inputs, probe via plan metadata (no ``df.rdd`` physical planning),
and only repartition when estimated work (bytes × multiplier) warrants it.
"""

from __future__ import annotations

import pytest

from bop_consus_importing_rdf_spark.operators.parallelism import (
    WORK_FLOOR_BYTES,
    _size_suffix_bytes,
    ensure_min_parallelism,
    plan_size_bytes,
)


def test_size_suffix_parser():
    assert _size_suffix_bytes("134217728b") == 134217728
    assert _size_suffix_bytes("128m") == 128 << 20
    assert _size_suffix_bytes("128MB") == 128 << 20
    assert _size_suffix_bytes("1g") == 1 << 30
    assert _size_suffix_bytes("4096") == 4096


@pytest.fixture()
def docs_parquet(spark, tmp_path):
    path = str(tmp_path / "docs.parquet")
    spark.range(2000).selectExpr(
        "cast(id as string) as doc_id",
        "repeat('lorem ipsum dolor sit amet ', 8) as text",
    ).coalesce(1).write.parquet(path)
    return spark.read.parquet(path)


def test_noop_on_tiny_input(docs_parquet):
    # ~tens of KB scan × multiplier 1 → below the work floor → identity
    out = ensure_min_parallelism(docs_parquet, multiplier=1)
    assert out is docs_parquet


def test_noop_on_wide_input(spark, docs_parquet):
    # shrink openCostInBytes so the same scan counts as "already wide"
    # under Spark's own split sizing (size >= cores × openCost)
    old = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.openCostInBytes", "64b")
        out = ensure_min_parallelism(docs_parquet, multiplier=10**6)
        assert out is docs_parquet
    finally:
        spark.conf.set("spark.sql.files.openCostInBytes", old)


def test_unknown_size_falls_back_to_physical_probe(spark):
    # stat-less plans (Long.MaxValue sentinel) use the partition-count
    # probe: already-parallel frames no-op, narrow frames fan out
    df = spark.createDataFrame([(1, "a")], "id int, t string")
    assert plan_size_bytes(df) == (1 << 63) - 1
    wide_enough = df.rdd.getNumPartitions() >= (
        spark.sparkContext.defaultParallelism
    )
    out = ensure_min_parallelism(df, multiplier=10**9)
    if wide_enough:
        assert out is df
    else:
        assert (
            out.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )
    narrow = df.coalesce(1).localCheckpoint()
    assert plan_size_bytes(narrow) == (1 << 63) - 1
    fanned = ensure_min_parallelism(narrow, multiplier=10**9)
    assert (
        fanned.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_repartitions_narrow_heavy_input(spark, docs_parquet):
    # force the work estimate over the floor → fan-out to default parallelism
    size = plan_size_bytes(docs_parquet)
    assert 0 < size < WORK_FLOOR_BYTES
    mult = (WORK_FLOOR_BYTES // size) + 1
    out = ensure_min_parallelism(docs_parquet, multiplier=mult)
    assert out is not docs_parquet
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # semantics unchanged
    assert out.count() == docs_parquet.count()
