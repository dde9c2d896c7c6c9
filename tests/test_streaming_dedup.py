"""Streaming exact dedup: cross-batch state, restart recovery, batch parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.streaming.dedup import stream_exact_dedup


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("append").parquet(path)


def test_stream_dedup_across_batches_and_restarts(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    # file 1: one in-file duplicate pair
    _write_docs(spark, in_dir, [(1, "alpha"), (2, "beta"), (3, "alpha")])
    q = stream_exact_dedup(spark, in_dir, out_dir)
    q.awaitTermination(120)
    first = spark.read.parquet(f"{out_dir}/data")
    assert first.count() == 2
    assert set(r.text for r in first.collect()) == {"alpha", "beta"}

    # file 2 arrives later: 'beta' is a cross-restart duplicate and must
    # be rejected by the RECOVERED state; 'gamma' is new
    _write_docs(spark, in_dir, [(4, "beta"), (5, "gamma")])
    q2 = stream_exact_dedup(spark, in_dir, out_dir)
    q2.awaitTermination(120)
    final = spark.read.parquet(f"{out_dir}/data")
    assert set(r.text for r in final.collect()) == {"alpha", "beta", "gamma"}
    assert final.count() == 3

    # batch parity on the surviving CONTENT set (representatives may
    # legitimately differ: batch keeps min doc_id, stream keeps first seen)
    batch_hashes = {
        r.m
        for r in spark.read.parquet(in_dir)
        .select(F.md5("text").alias("m"))
        .distinct()
        .collect()
    }
    assert {r.content_md5 for r in final.collect()} == batch_hashes


def test_stream_line_dedup_across_batches_and_restarts(spark, tmp_path):
    from bop_consus_importing_rdf_spark.operators.dedup import line_dedup
    from bop_consus_importing_rdf_spark.streaming.dedup import (
        stream_line_dedup,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    # file 1: "boiler" repeats within doc 1 and across docs 1/2
    _write_docs(
        spark, in_dir,
        [(1, "boiler\nalpha\nboiler\nbeta"), (2, "boiler\ngamma")],
    )
    q = stream_line_dedup(spark, in_dir, out_dir)
    q.awaitTermination(120)
    first = {r.doc_id: r for r in spark.read.parquet(f"{out_dir}/data").collect()}
    # WHICH doc keeps the cross-doc duplicate 'boiler' is not contractual
    # (docs 1 and 2 share a micro-batch; dropDuplicates picks an arbitrary
    # within-batch winner) — the contract is: every distinct line survives
    # exactly once, per-doc counts are consistent, and kept lines preserve
    # their original in-doc order
    all_lines = [
        ln for r in first.values() for ln in r.text.split("\n")
    ]
    assert sorted(all_lines) == ["alpha", "beta", "boiler", "gamma"]
    assert first[1].text.split("\n") in (
        ["boiler", "alpha", "beta"],  # doc 1 won 'boiler'
        ["alpha", "beta"],            # doc 2 won it
    )
    for r in first.values():
        assert r.n_kept == len(r.text.split("\n"))
    assert (first[1].n_lines, first[2].n_lines) == (4, 2)

    # file 2 after a restart: every line of doc 3 was seen before the
    # restart (recovered state must reject it entirely); doc 4 is partly
    # fresh
    _write_docs(spark, in_dir, [(3, "alpha\ngamma"), (4, "beta\ndelta")])
    q2 = stream_line_dedup(spark, in_dir, out_dir)
    q2.awaitTermination(120)
    final = {r.doc_id: r for r in spark.read.parquet(f"{out_dir}/data").collect()}
    assert set(final) == {1, 2, 4}
    assert final[4].text == "delta"
    assert (final[4].n_lines, final[4].n_kept) == (2, 1)

    # parity with the batch operator on the surviving LINE SET (which doc
    # keeps a shared line may differ: batch = min (id, pos), stream =
    # first arrival)
    batch = line_dedup(spark.read.parquet(in_dir), "doc_id", "text")
    batch_lines = set()
    for r in batch.collect():
        batch_lines.update(r.text.split("\n"))
    stream_lines = set()
    for r in final.values():
        stream_lines.update(r.text.split("\n"))
    assert stream_lines == batch_lines
