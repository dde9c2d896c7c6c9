#!/usr/bin/env python
"""Stage-level wall-clock breakdown of the graded split query at sf0.1.

Mirrors the ROUND-6 split_datasets spelling (fused subject/identifier
aggregation, checkpointed catalogue roots, anti-join root split,
subject-pruned closure, shared counts exchange) with a timer around every
driver-side action. Untimed setup mirrors bench.py (the bucketed landing).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from bop_consus_importing_rdf_spark.functions.identify import identify
    from bop_consus_importing_rdf_spark.operators.cleanup import (
        drop_blank_identifiers,
        remove_lowercase_dataset_typo,
    )
    from bop_consus_importing_rdf_spark.operators.closure import (
        reachable_closure,
        subgraph_triples,
    )
    from bop_consus_importing_rdf_spark.operators.split import (
        split_triple_counts,
    )
    from bop_consus_importing_rdf_spark.oracle import bucketed_graph
    from bop_consus_importing_rdf_spark.session import get_spark
    from bop_consus_importing_rdf_spark.vocab import (
        DCAT_CATALOG,
        DCAT_DATASET,
        DCT_IDENTIFIER,
        RDF_TYPE,
    )

    spark = get_spark("r06-profile-split", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    t0 = time.perf_counter()
    g = bucketed_graph(spark, SF_DIR)
    print(f"[untimed] bucketed landing: {time.perf_counter()-t0:.2f}s")

    last = [time.perf_counter()]

    def lap(name):
        now = time.perf_counter()
        print(f"  {name}: {now - last[0]:.3f}s")
        last[0] = now

    t = remove_lowercase_dataset_typo(g)
    is_ds_stmt = (F.col("pred") == RDF_TYPE) & (
        F.col("obj_value") == DCAT_DATASET
    )
    is_id_stmt = F.col("pred") == DCT_IDENTIFIER
    sc.setJobDescription("split: named checkpoint (fused F2+X1)")
    named = drop_blank_identifiers(
        t.filter(is_ds_stmt | is_id_stmt)
        .groupBy("subj")
        .agg(
            F.max(is_ds_stmt).alias("_is_ds"),
            F.min(F.when(is_id_stmt, F.col("obj_value"))).alias("_dct_id"),
        )
        .filter(F.col("_is_ds"))
        .select(
            "subj",
            identify(F.col("subj"), F.col("_dct_id"), False, False).alias(
                "identifier"
            ),
        )
    ).localCheckpoint()
    lap("named.localCheckpoint (fused one-scan F2+X1)")

    ds_seeds = named.select(F.col("subj").alias("root"), F.col("subj").alias("node"))
    sc.setJobDescription("split: cat_roots checkpoint")
    cat_roots = (
        t.filter((F.col("pred") == RDF_TYPE) & (F.col("obj_value") == DCAT_CATALOG))
        .select(F.col("subj").alias("root"), F.col("subj").alias("node"))
        .distinct()
        .localCheckpoint()
    )
    lap("cat_roots.localCheckpoint")
    sc.setJobDescription("split: closure")
    closure = reachable_closure(
        t, ds_seeds.union(cat_roots), prune_to_subjects=True
    )
    lap("reachable_closure (pruned, all internal actions)")

    ds_closure = closure.join(cat_roots.select("root"), "root", "left_anti")
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

    counts = split_triple_counts(final)
    non_empty = counts.select(F.col("dataset_id").alias("subj"))
    datasets = named.join(non_empty, "subj", "left_semi").select(
        "subj", "identifier"
    )
    out = datasets.join(
        counts, datasets["subj"] == counts["dataset_id"]
    ).select(F.col("dataset_id"), F.col("identifier"), F.col("n_triples"))
    sc.setJobDescription("split: consumer materialize")
    out.write.format("noop").mode("overwrite").save()
    lap("consumer noop materialize (shared counts exchange)")
    print(f"TOTAL incl landing: {time.perf_counter()-t0:.3f}s")


if __name__ == "__main__":
    main()
