#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line: ``{"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}``.

Every query is forced through the ``noop`` sink — full materialization, no
count-only column pruning shortcuts. The KG pipeline runs over a synthetic
transcript corpus sized to the scale factor (~12 turns/conv incl. the 1%
hot conversations) and additionally reports ``turns_per_sec`` — the
north-rule throughput metric used by the N-vs-4N scaling evidence
(see BENCH/BASELINE.md, produced by scripts/scaling_bench.py).

Usage: python bench.py [--only QUERY[,QUERY...]] [--cpus N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--n-conv", type=int, default=None,
                    help="override synthetic conversation count")
    ap.add_argument("--warmup", action="store_true",
                    help="run a small pipeline first so Python workers / "
                         "codegen spin-up is excluded from timings")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 16g measured faster AND far more stable than larger heaps at 32
    # threads (GC churn during cache materialization) — see BENCH/BASELINE.md
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

    from bop_consus_importing_rdf_spark.session import get_spark

    spark = get_spark("bench", cores=cpus)  # shuffle partitions = 3× cores
    spark.sparkContext.setLogLevel("ERROR")

    from bop_consus_importing_rdf_spark.kg.pipeline import build_kg
    from bop_consus_importing_rdf_spark.kg.synth import (
        alias_table,
        synth_transcripts,
    )
    from bop_consus_importing_rdf_spark.oracle import SPARK_QUERIES
    from bop_consus_importing_rdf_spark.sources.rdf_io import parse_ntriples

    # scale the synthetic transcript corpus with the sf tables
    import duckdb

    n_li = duckdb.sql(
        f"select count(*) from '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    # sf0.1 (600k lineitems) → 20k conversations ≈ 240k turns (FIXTURES.md)
    n_conv = args.n_conv or max(200, n_li // 30)

    need_kg = args.only is None or "kg_pipeline" in args.only.split(",")
    aliases = alias_table(spark)
    if need_kg:
        transcripts = synth_transcripts(spark, n_conv=n_conv, seed=42).cache()
        n_turns = transcripts.count()  # also warms the cache
    else:
        # don't park a dead transcript cache in the heap for --only runs
        # that never touch the KG pipeline
        transcripts, n_turns = None, n_conv * 12

    if args.warmup:
        small = synth_transcripts(spark, n_conv=200, seed=1)
        materialize(build_kg(spark, small, aliases)["triples"])

    def bench_kg_pipeline():
        materialize(build_kg(spark, transcripts, aliases)["triples"])
        # the transcript cache and build_kg's persisted UDF subtree are dead
        # weight for every later query — dropping them here keeps the
        # remaining timings free of their GC pressure (checkpointed RDD
        # blocks used by the split-family queries are unaffected)
        transcripts.unpersist()
        spark.catalog.clearCache()

    headline = {
        "kg_pipeline": bench_kg_pipeline,
        "split_datasets": lambda: materialize(
            SPARK_QUERIES["split_datasets"](spark, sf_dir)
        ),
        "canonical_hash": lambda: materialize(
            SPARK_QUERIES["canonical_hash"](spark, sf_dir)
        ),
        "nt_render": lambda: materialize(
            SPARK_QUERIES["nt_render"](spark, sf_dir)
        ),
        "doc_kg_triples": lambda: materialize(
            SPARK_QUERIES["doc_kg_triples"](spark, sf_dir)
        ),
        "minhash_lsh_pairs": lambda: materialize(
            SPARK_QUERIES["minhash_lsh_pairs"](spark, sf_dir)
        ),
        "cosine_topk": lambda: materialize(
            SPARK_QUERIES["cosine_topk"](spark, sf_dir)
        ),
        "events_sessionize": lambda: materialize(
            SPARK_QUERIES["events_sessionize"](spark, sf_dir)
        ),
        # repartition before the parse: the rendered lines arrive in the
        # union's ~18 natural partitions, starving the 32 cores of regex
        # work — a real ingest has many input splits
        "nt_parse": lambda: materialize(
            parse_ntriples(
                SPARK_QUERIES["nt_render"](spark, sf_dir)
                .withColumnRenamed("line", "value")
                .repartition(2 * cpus)
            )
        ),
    }
    if args.only:
        keep = set(args.only.split(","))
        headline = {k: v for k, v in headline.items() if k in keep}

    timings: dict[str, float] = {}
    for name, fn in headline.items():
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": cpus,
        "n_turns": n_turns,
        "turns_per_sec": (
            round(n_turns / timings["kg_pipeline"], 1)
            if "kg_pipeline" in timings
            else None
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
