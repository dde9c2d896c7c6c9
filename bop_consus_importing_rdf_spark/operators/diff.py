"""Incremental-harvest change detection between two snapshot hash tables.

The reference attaches a canonical per-dataset content hash to every
emitted dataset (``sendHash``, config.schema.json:55-59; CHANGELOG 1.0.0
"Use jena utils for canonical hash calculation") precisely so the
downstream pipeline can tell, on the NEXT harvest of the same catalogue,
which datasets actually changed and skip the rest. The reference leaves
the comparison to its consumer; :func:`harvest_diff` is that comparison
as a relational operator — the piece that turns repeated full harvests
into an incremental pipeline.

Scale shape: one full-outer shuffle join on the dataset id between two
(id, hash) tables — each a tiny projection of its harvest (two columns,
one row per dataset, no payloads). At 100 TB of triples the hash tables
are still only O(datasets); if both snapshots come from the bucketed
landing layout (harvest.py) keyed the same way, the join co-locates and
plans exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change-status values, in output order of precedence
STATUS_ADDED = "added"
STATUS_REMOVED = "removed"
STATUS_CHANGED = "changed"
STATUS_UNCHANGED = "unchanged"


def harvest_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "dataset_id",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Classify every dataset across two harvest snapshots.

    ``old`` / ``new`` are (id, canonical hash) tables — e.g. the output
    of the canonical-hash aggregation over two harvest runs. Returns
    ``(dataset_id, status, old_hash, new_hash)`` with status one of
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (both, hashes differ), ``unchanged`` (both, hashes equal).

    A duplicate id within one snapshot would make the join fan out;
    canonical-hash tables are one-row-per-dataset by construction
    (groupBy dataset_id), so the operator does not re-aggregate.
    """
    o = old.select(
        F.col(id_col).alias("dataset_id"), F.col(hash_col).alias("old_hash")
    )
    n = new.select(
        F.col(id_col).alias("dataset_id"), F.col(hash_col).alias("new_hash")
    )
    return o.join(n, "dataset_id", "full_outer").select(
        "dataset_id",
        F.when(F.col("old_hash").isNull(), F.lit(STATUS_ADDED))
        .when(F.col("new_hash").isNull(), F.lit(STATUS_REMOVED))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit(STATUS_CHANGED))
        .otherwise(F.lit(STATUS_UNCHANGED))
        .alias("status"),
        "old_hash",
        "new_hash",
    )
