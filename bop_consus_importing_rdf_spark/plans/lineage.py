"""Per-partition lineage & metrics rows (north-rule requirement).

The reference logs one line per emitted dataset
(``ImportingRdfVerticle.kt:92-93``) and a run-finished marker (``:97``).
Here every wrapped stage emits ``(run_id, stage, partition_id, rows_out)``
rows computed with a ``spark_partition_id()`` aggregation — one cheap
map-side count per stage, collected into a ``lineage_metrics`` table the
run can be audited/resumed from.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stage_metrics(df: DataFrame, run_id: str, stage: str) -> DataFrame:
    """Per-partition row counts for one stage.

    NOTE this triggers a separate job over ``df``; cache the stage output
    first if it is expensive to recompute.
    """
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows_out"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "rows_out",
        )
    )


def union_metrics(parts: list[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), parts)
