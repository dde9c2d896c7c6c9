#!/usr/bin/env python
"""Stage-level wall-clock breakdown of the graded split query at sf0.1.

Replays split_datasets(bucketed_graph(...), input_materialized=True) with a
timer around every driver-side action (persist fill, stats agg, unroll
checkpoint, isEmpty probe, final checkpoint, consumer materialize) so the
bench seconds can be attributed to specific jobs. Untimed setup mirrors
bench.py (the bucketed landing).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bop_consus_importing_rdf_spark.oracle import bucketed_graph
    from bop_consus_importing_rdf_spark.session import get_spark

    spark = get_spark("r06-profile-split", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    t0 = time.perf_counter()
    g = bucketed_graph(spark, SF_DIR)
    print(f"[untimed] bucketed landing: {time.perf_counter()-t0:.2f}s")

    times = {}

    def mark(name):
        times[name] = time.perf_counter()

    def lap(name):
        now = time.perf_counter()
        prev = max(times.values())
        print(f"  {name}: {now - prev:.3f}s")
        times[name] = now

    from bop_consus_importing_rdf_spark.functions.identify import with_identifier
    from bop_consus_importing_rdf_spark.operators.cleanup import (
        dataset_subjects,
        drop_blank_identifiers,
        remove_lowercase_dataset_typo,
    )
    from bop_consus_importing_rdf_spark.operators.closure import (
        reachable_closure,
        subgraph_triples,
    )
    from bop_consus_importing_rdf_spark.vocab import DCAT_CATALOG, RDF_TYPE

    sc.setJobDescription("split: total")
    mark("start")
    t = remove_lowercase_dataset_typo(g)
    subjects = dataset_subjects(t)
    sc.setJobDescription("split: named checkpoint")
    named = drop_blank_identifiers(
        with_identifier(subjects, t, False, False)
    ).localCheckpoint()
    lap("named.localCheckpoint")

    ds_seeds = named.select(F.col("subj").alias("root"), F.col("subj").alias("node"))
    cat_roots = (
        t.filter((F.col("pred") == RDF_TYPE) & (F.col("obj_value") == DCAT_CATALOG))
        .select(F.col("subj").alias("root"), F.col("subj").alias("node"))
        .distinct()
    )
    sc.setJobDescription("split: closure")
    closure = reachable_closure(t, ds_seeds.union(cat_roots))
    lap("reachable_closure (all internal actions)")

    ds_closure = closure.join(
        named.select(F.col("subj").alias("root")), "root", "left_semi"
    )
    ds_triples = subgraph_triples(t, ds_closure, root_alias="dataset_id")
    cat_in_ds = ds_closure.join(
        cat_roots.select(F.col("root").alias("cat_root")),
        ds_closure["node"] == F.col("cat_root"),
    ).select(F.col("root").alias("dataset_id"), "cat_root")
    removal = (
        cat_in_ds.join(closure, cat_in_ds["cat_root"] == closure["root"])
        .select("dataset_id", F.col("node").alias("subj"))
        .distinct()
    )
    sc.setJobDescription("split: final checkpoint")
    final = ds_triples.join(
        removal, ["dataset_id", "subj"], "left_anti"
    ).localCheckpoint()
    lap("final.localCheckpoint (subgraph+anti-join)")

    non_empty = final.select(F.col("dataset_id").alias("subj")).distinct()
    datasets = named.join(non_empty, "subj", "left_semi").select(
        "subj", "identifier"
    )
    counts = final.groupBy("dataset_id").agg(F.count(F.lit(1)).alias("n_triples"))
    out = datasets.join(
        counts, datasets["subj"] == counts["dataset_id"]
    ).select(F.col("dataset_id"), F.col("identifier"), F.col("n_triples"))
    sc.setJobDescription("split: consumer materialize")
    out.write.format("noop").mode("overwrite").save()
    lap("consumer noop materialize")
    total = time.perf_counter() - times["start"] if False else None
    print(f"TOTAL timed: {time.perf_counter()-t0:.3f}s incl landing")


if __name__ == "__main__":
    main()
