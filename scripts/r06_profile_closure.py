#!/usr/bin/env python
"""Closure-internals wall breakdown at sf0.1 over the bucketed graph."""

from __future__ import annotations

import sys
import time
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bop_consus_importing_rdf_spark.functions.identify import with_identifier
    from bop_consus_importing_rdf_spark.operators.cleanup import (
        dataset_subjects,
        drop_blank_identifiers,
        remove_lowercase_dataset_typo,
    )
    from bop_consus_importing_rdf_spark.operators.closure import _hop
    from bop_consus_importing_rdf_spark.oracle import bucketed_graph
    from bop_consus_importing_rdf_spark.session import get_spark
    from bop_consus_importing_rdf_spark.vocab import (
        DCAT_CATALOG,
        KIND_BNODE,
        KIND_IRI,
        RDF_TYPE,
    )

    spark = get_spark("r06-profile-closure", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    g = bucketed_graph(spark, SF_DIR)
    print(f"[untimed] landing: {time.perf_counter()-t0:.2f}s")

    t = remove_lowercase_dataset_typo(g)
    tt = time.perf_counter()
    named = drop_blank_identifiers(
        with_identifier(dataset_subjects(t), t, False, False)
    ).localCheckpoint()
    print(f"named checkpoint: {time.perf_counter()-tt:.3f}s  rows={named.count()}")

    ds_seeds = named.select(F.col("subj").alias("root"), F.col("subj").alias("node"))
    cat_roots = (
        t.filter((F.col("pred") == RDF_TYPE) & (F.col("obj_value") == DCAT_CATALOG))
        .select(F.col("subj").alias("root"), F.col("subj").alias("node"))
        .distinct()
    )
    seeds = ds_seeds.union(cat_roots)

    tt = time.perf_counter()
    edges = (
        t.filter(F.col("obj_kind").isin(KIND_IRI, KIND_BNODE))
        .select(F.col("subj").alias("_src"), F.col("obj_value").alias("_dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("_src").alias("n_src"),
    ).first()
    print(
        f"edges persist+stats: {time.perf_counter()-tt:.3f}s  "
        f"n={stats['n']} n_src={stats['n_src']}"
    )

    broadcast = stats["n"] <= 4_000_000
    print(f"broadcast={broadcast}")

    tt = time.perf_counter()
    first = seeds.select("root", "node").distinct()
    parts = [first.withColumn("_k", F.lit(0))]
    hop = first
    for h in range(4):
        hop = _hop(hop, edges, f"_u{h}", [], broadcast)
        parts.append(hop.withColumn("_k", F.lit(h + 1)))
    agg = (
        reduce(lambda a, b: a.union(b))
        if False
        else reduce(lambda a, b: a.union(b), parts)
        .groupBy("root", "node")
        .agg(F.max("_k").alias("_k"))
        .localCheckpoint()
    )
    print(f"unroll agg checkpoint: {time.perf_counter()-tt:.3f}s rows={agg.count()}")

    tt = time.perf_counter()
    frontier = agg.filter(F.col("_k") == 4).drop("_k")
    empty = frontier.isEmpty()
    print(f"frontier isEmpty: {time.perf_counter()-tt:.3f}s empty={empty}")
    edges.unpersist()


if __name__ == "__main__":
    main()
