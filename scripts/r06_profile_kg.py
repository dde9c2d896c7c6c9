#!/usr/bin/env python
"""Wall breakdown of bench's kg_pipeline at sf0.1 (238k synthetic turns)."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    from pyspark.sql import functions as F

    from bop_consus_importing_rdf_spark.kg.pipeline import (
        best_alias_map,
        canonical_entity_map,
        extract_candidate_triples,
        stable_turns,
    )
    from bop_consus_importing_rdf_spark.kg.synth import alias_table, synth_transcripts
    from bop_consus_importing_rdf_spark.session import get_spark

    spark = get_spark("r06-profile-kg", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    n_li = duckdb.sql(
        f"select count(*) from '{SF_DIR}/lineitem.parquet'"
    ).fetchone()[0]
    n_conv = max(200, n_li // 30)
    aliases = alias_table(spark)
    transcripts = synth_transcripts(spark, n_conv=n_conv, seed=42).cache()
    n = transcripts.count()
    print(f"[untimed] corpus cached: {n} turns")

    t0 = time.perf_counter()
    turns = stable_turns(transcripts)
    small = aliases.limit(50_001).count() <= 50_000
    t1 = time.perf_counter()
    print(f"threshold probe: {t1-t0:.3f}s (small={small})")
    canon = canonical_entity_map(aliases, 50_000, small=small)
    alias_list = [r.alias for r in aliases.select("alias").distinct().collect()]
    best = best_alias_map(aliases)
    canon_map = {r.entity_uri: r.canonical_id for r in canon.collect()}
    composed = {a: canon_map.get(e, e) for a, e in best.items()}
    t2 = time.perf_counter()
    print(f"canonical map driver work: {t2-t1:.3f}s")

    triples = extract_candidate_triples(
        turns, aliases, alias_list, entity_map=composed
    ).withColumn("dataset_id", F.concat(F.lit("urn:kg:conv:"), F.col("conv_id")))
    triples.write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()
    print(f"extraction + union materialize: {t3-t2:.3f}s")

    transcripts.unpersist()
    spark.catalog.clearCache()
    t4 = time.perf_counter()
    print(f"unpersist+clearCache: {t4-t3:.3f}s")
    print(f"TOTAL timed: {t4-t0:.3f}s")


if __name__ == "__main__":
    main()
