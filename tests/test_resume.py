"""Checkpoint/resume: idempotent restart after injected partial failure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.kg.synth import alias_table, synth_transcripts
from bop_consus_importing_rdf_spark.plans.resume import (
    committed_buckets,
    remaining_conversations,
    run_resumable,
)


def test_resume_after_partial_failure(spark, tmp_path):
    # explicit file: URI — the commit-marker existence check goes through the
    # Hadoop FileSystem API, so the same code path serves hdfs:/s3a: URIs
    out_dir = "file://" + str(tmp_path / "kg_out")
    t = synth_transcripts(spark, n_conv=10, seed=5)
    aliases = alias_table(spark)

    from bop_consus_importing_rdf_spark.plans.resume import BUCKET_COL, with_bucket

    n_present = (
        with_bucket(t, 4).select(BUCKET_COL).distinct().count()
    )
    assert n_present >= 3  # fixture must exercise a real partial run

    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(spark, t, aliases, out_dir, n_buckets=4, fail_after_bucket=2)
    assert len(committed_buckets(spark, out_dir)) == 2

    # restart: only the remaining buckets run
    n = run_resumable(spark, t, aliases, out_dir, n_buckets=4)
    assert n == n_present - 2
    assert len(committed_buckets(spark, out_dir)) == n_present

    # a third run is a no-op (idempotent)
    assert run_resumable(spark, t, aliases, out_dir, n_buckets=4) == 0

    # lineage: every committed bucket wrote per-partition metrics rows into
    # its own bucket=<b> partition (replay-idempotent overwrite); reading the
    # parent dir surfaces the partition column
    metrics = spark.read.parquet(f"{out_dir}/lineage_metrics")
    assert metrics.count() > 0
    assert set(metrics.columns) == {
        "run_id", "stage", "partition_id", "rows_out", "bucket"
    }
    # exactly one run's metrics per bucket survives replay — the bucket
    # re-run in the restart overwrote the crashed attempt's rows
    per_bucket_runs = (
        metrics.select("bucket", "run_id").distinct()
        .groupBy("bucket").count().filter(F.col("count") > 1)
    )
    assert per_bucket_runs.isEmpty()
    stages = {r.stage for r in metrics.select("stage").distinct().collect()}
    assert any(s.endswith("triples_out") for s in stages)
    assert any(s.endswith("transcripts_in") for s in stages)
    # rows_out of the triples_out stages sums to the committed triple count
    from pyspark.sql import functions as SF
    total_out = (
        metrics.filter(SF.col("stage").endswith("triples_out"))
        .agg(SF.sum("rows_out")).collect()[0][0]
    )

    # the union of bucket outputs covers every conversation exactly once
    triples = spark.read.parquet(f"{out_dir}/triples")
    assert total_out == triples.count()
    convs = {r.conv_id for r in triples.select("conv_id").distinct().collect()}
    assert convs == {r.conv_id for r in t.select("conv_id").distinct().collect()}

    # full-corpus single-shot run produces the same triple set
    from bop_consus_importing_rdf_spark.kg.pipeline import build_kg

    ref = build_kg(spark, t, aliases)["triples"]
    cols = ["conv_id", "subj", "pred", "obj_value", "obj_kind"]
    assert triples.select(cols).exceptAll(ref.select(cols)).count() == 0
    assert ref.select(cols).exceptAll(triples.select(cols)).count() == 0


def test_remaining_conversations_filters_committed(spark, tmp_path):
    out_dir = str(tmp_path / "kg_out2")
    t = synth_transcripts(spark, n_conv=6, seed=9)
    rem0 = remaining_conversations(spark, t, out_dir, n_buckets=4)
    assert rem0.count() == t.count()
