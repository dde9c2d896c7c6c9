"""Structured Streaming ingestion: incremental extraction drains a directory."""

from __future__ import annotations

from bop_consus_importing_rdf_spark.kg.synth import alias_table, synth_transcripts
from bop_consus_importing_rdf_spark.streaming.ingest import stream_extract_triples


def test_stream_drains_and_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    t = synth_transcripts(spark, n_conv=5, seed=11)
    t.write.parquet(in_dir)
    aliases = alias_table(spark)

    q = stream_extract_triples(spark, in_dir, out_dir, aliases)
    q.awaitTermination(120)

    got = spark.read.parquet(f"{out_dir}/batch_id=0")
    assert got.count() > 0
    assert set(got.columns) >= {"conv_id", "turn_idx", "entity_uri"}

    # batch equivalence on the same input
    from bop_consus_importing_rdf_spark.kg.linking import (
        explode_mentions,
        link_entities,
    )
    from bop_consus_importing_rdf_spark.kg.mentions import detect_mentions
    from pyspark.sql import functions as F

    alias_list = [r.alias for r in aliases.select("alias").distinct().collect()]
    batch = link_entities(
        explode_mentions(
            t.withColumn("mentions", detect_mentions(F.col("text"), alias_list))
        ),
        aliases,
    )
    assert got.count() == batch.count()
