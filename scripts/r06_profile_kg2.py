#!/usr/bin/env python
"""Extraction-stage micro-breakdown for the bench kg_pipeline."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bop_consus_importing_rdf_spark.kg.mentions import (
        extract_mentions_and_relations,
    )
    from bop_consus_importing_rdf_spark.kg.pipeline import (
        best_alias_map,
        stable_turns,
    )
    from bop_consus_importing_rdf_spark.kg.synth import alias_table, synth_transcripts
    from bop_consus_importing_rdf_spark.session import get_spark

    spark = get_spark("r06-profile-kg2", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    n_li = duckdb.sql(
        f"select count(*) from '{SF_DIR}/lineitem.parquet'"
    ).fetchone()[0]
    n_conv = max(200, n_li // 30)
    aliases = alias_table(spark)
    transcripts = synth_transcripts(spark, n_conv=n_conv, seed=42).cache()
    print(f"[untimed] corpus cached: {transcripts.count()} turns")
    alias_list = [r.alias for r in aliases.select("alias").distinct().collect()]
    best = best_alias_map(aliases)

    t0 = time.perf_counter()
    turns = stable_turns(transcripts)
    noop(turns)
    t1 = time.perf_counter()
    print(f"stable_turns alone: {t1-t0:.3f}s")

    with_m = turns.withColumn(
        "_mr",
        extract_mentions_and_relations(F.col("text"), alias_list, "jvm"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    noop(with_m)
    t2 = time.perf_counter()
    print(f"window + regex extraction + persist fill: {t2-t1:.3f}s")

    # branch costs off the warm persist
    from bop_consus_importing_rdf_spark.kg.pipeline import (
        extract_candidate_triples,
    )

    triples = extract_candidate_triples(
        turns, aliases, alias_list, entity_map=best
    )
    noop(triples)
    t3 = time.perf_counter()
    print(
        "full extract_candidate_triples (recomputes its own persist): "
        f"{t3-t2:.3f}s"
    )


if __name__ == "__main__":
    main()
