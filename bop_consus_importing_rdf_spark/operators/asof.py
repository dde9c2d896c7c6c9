"""As-of (point-in-time) join — the time-series enrichment join Spark has
no builtin for: for each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key (quotes→trades, config→events,
rates→transactions). DuckDB spells it ``ASOF JOIN``; the reference's event
pipeline never needs it, but any transcript/event corpus enrichment at
scale does (SURVEY §2.8 extension surface).

Implementation is the single-shuffle union-tag algorithm, NOT a range
join: both sides are tagged and unioned, hash-partitioned by the key once,
sorted in-partition by ``(ts, side)``, and the latest right-side values
are carried forward onto each left row with ``last(..., ignorenulls=True)``
over a running (unbounded-preceding → current) window — Spark evaluates
that frame with a streaming accumulator, no per-row rescan. At 100 TB this
is the plan you want: ONE exchange shared by both inputs, no O(L×R) range
explosion, no per-key collect, and AQE skew handling applies to the single
shuffle like any other.

Tie semantics: a right row at exactly ``left.ts`` matches (``<=``) — right
rows sort BEFORE left rows at equal ts. Among multiple right rows with the
same ``(key, ts)`` the carried one is the last under ``tiebreak_col``
ordering if given, else arbitrary-but-stable within the sorted partition
(callers with duplicate right timestamps should pass a tiebreak).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
    tolerance_seconds: float | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``prefix``-ed columns
    holding the matched right row's ``right_ts`` and ``value_cols``
    (NULL when no right row precedes it; with ``tolerance_seconds``,
    matches staler than the tolerance are nulled out too).

    ``value_cols`` defaults to every right column except the key and
    timestamp.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]

    lt = (
        left.withColumn("_asof_ts", F.col(left_ts))
        .withColumn("_asof_side", F.lit(1))
    )
    carried_src = [right_ts] + value_cols
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        *[F.col(c).alias(f"_asof_r_{c}") for c in carried_src],
    )
    u = lt.unionByName(rt, allowMissingColumns=True)

    order = [F.col("_asof_ts"), F.col("_asof_side")]
    if tiebreak_col is not None:
        order.append(F.col(f"_asof_r_{tiebreak_col}"))
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = {
        c: F.last(F.col(f"_asof_r_{c}"), ignorenulls=True).over(w)
        for c in carried_src
    }
    if tolerance_seconds is not None:
        stale = (
            F.col("_asof_ts").cast("double")
            - carried[right_ts].cast("timestamp").cast("double")
        ) > F.lit(float(tolerance_seconds))
        carried = {
            c: F.when(stale, F.lit(None)).otherwise(expr)
            for c, expr in carried.items()
        }

    out_ts = carried[right_ts].alias(f"{prefix}{right_ts}")
    out_vals = [carried[c].alias(f"{prefix}{c}") for c in value_cols]
    return (
        u.select(*left.columns, F.col("_asof_side"), out_ts, *out_vals)
        .filter(F.col("_asof_side") == 1)
        .drop("_asof_side")
    )
