"""Event-time streaming: watermark late-drop + stateful sessionization."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.streaming.windows import (
    stream_sessionize,
    windowed_mention_counts,
)

T0 = datetime(2026, 1, 1, 0, 0, 0)

EVENT_SCHEMA = "user_id long, event_id long, ts timestamp, kind string"


def _write(df, path):
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Three micro-batches; the last carries a row far older than the
    watermark established two batches earlier — the engine must drop it.

    (The late row sits TWO batches after the watermark-advancing event:
    Spark applies a newly advanced watermark starting with the
    next-but-one micro-batch, an engine detail verified empirically —
    a late row in the immediately following batch still lands.)
    """
    import time

    in_dir = str(tmp_path / "in")
    rows1 = [
        (1, 1, T0 + timedelta(minutes=5), "a"),
        (1, 2, T0 + timedelta(minutes=10), "a"),
        # advances max event time to T0+3h → watermark = T0+2h30m
        (2, 3, T0 + timedelta(hours=3), "b"),
    ]
    rows2 = [(2, 9, T0 + timedelta(hours=3, minutes=1), "b")]
    rows3 = [
        (1, 4, T0 + timedelta(minutes=20), "a"),   # LATE: < watermark → drop
        (2, 5, T0 + timedelta(hours=3, minutes=5), "b"),
    ]
    for i, rows in enumerate((rows1, rows2, rows3), 1):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(
            f"{in_dir}/f{i}"
        )
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/*")
    )
    agg = windowed_mention_counts(
        stream, window_duration="1 hour", watermark_delay="30 minutes"
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("wmc")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.key, r.window.start.hour): r.n_events
        for r in spark.sql(
            "SELECT key, window, max(n_events) AS n_events FROM wmc "
            "GROUP BY key, window"
        ).collect()
    }
    # hour-0 'a' window: events 1,2 counted; LATE event 4 dropped
    assert got[("a", 0)] == 2
    # hour-3 'b' window: all three on-time rows counted across batches
    assert got[("b", 3)] == 3


def test_stream_sessionize_state_survives_batches(spark, tmp_path):
    """A session spanning two micro-batches keeps ONE session index, and a
    cross-batch gap > 1800 s opens a new one — equivalent to the batch
    window computation on the union."""
    in_dir = str(tmp_path / "sess_in")
    rows1 = [
        (7, 1, T0, "x"),
        (7, 2, T0 + timedelta(minutes=10), "x"),
        (9, 3, T0, "x"),
    ]
    rows2 = [
        # 20 min after event 2 → SAME session, state must remember
        (7, 4, T0 + timedelta(minutes=30), "x"),
        # 2 h after event 4 → new session
        (7, 5, T0 + timedelta(hours=3), "x"),
        # user 9: gap of 1 h → new session
        (9, 6, T0 + timedelta(hours=1), "x"),
    ]
    import time

    spark.createDataFrame(rows1, EVENT_SCHEMA).coalesce(1).write.parquet(
        f"{in_dir}/f1"
    )
    time.sleep(1.1)  # distinct mtimes → f1 strictly before f2
    spark.createDataFrame(rows2, EVENT_SCHEMA).coalesce(1).write.parquet(
        f"{in_dir}/f2"
    )

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/*")
    )
    q = (
        stream_sessionize(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_id: r.session_idx
        for r in spark.sql("SELECT * FROM sess").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 2, 6: 2}

    # batch equivalence: same session labels as the batch window query
    union = spark.createDataFrame(rows1 + rows2, EVENT_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    gap = F.expr("timestampdiff(MICROSECOND, _prev, ts)")
    batch = (
        union.withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "session_idx",
            F.sum(
                F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
            ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    batch_map = {
        r.event_id: r.session_idx for r in batch.collect()
    }
    assert got == batch_map


def test_stream_sessionize_reordering_tolerates_cross_batch_disorder(
    spark, tmp_path
):
    """Events arriving out of event-time order ACROSS micro-batches (but
    within the watermark delay) still get batch-identical session labels.
    The plain sessionizer's contract would mislabel these; the reordering
    variant buffers them until the watermark passes."""
    import time

    from bop_consus_importing_rdf_spark.streaming.windows import (
        stream_sessionize_reordering,
    )

    in_dir = str(tmp_path / "re_in")
    # user 7: event 3 (T0+35m) arrives a batch AFTER events at T0+40m/45m;
    # it must still join their session and take its in-order position.
    # user 9: disorder across a >gap boundary — event 6 (T0+3h) arrives
    # before event 5 (T0+2h50m); both belong to session 2.
    rows1 = [
        (7, 1, T0 + timedelta(minutes=40), "x"),
        (7, 2, T0 + timedelta(minutes=45), "x"),
        (9, 4, T0, "x"),
        (9, 6, T0 + timedelta(hours=3), "x"),
    ]
    rows2 = [
        (7, 3, T0 + timedelta(minutes=35), "x"),        # late by 10 min
        (9, 5, T0 + timedelta(hours=2, minutes=50), "x"),  # late by 10 min
    ]
    # flush batches: advance the watermark far past the data, then two
    # more batches so the engine applies it (a new watermark takes effect
    # next-but-one micro-batch — see test_watermark_drops_late_rows)
    flushes = [
        [(99, 100 + i, T0 + timedelta(hours=10 + i), "x")] for i in range(3)
    ]
    for i, rows in enumerate([rows1, rows2, *flushes], 1):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(
            f"{in_dir}/f{i}"
        )
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/*")
    )
    q = (
        stream_sessionize_reordering(stream, watermark_delay="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("resess")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_id: r.session_idx
        for r in spark.sql(
            "SELECT * FROM resess WHERE user_id IN (7, 9)"
        ).collect()
    }

    union = spark.createDataFrame(rows1 + rows2, EVENT_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    gap = F.expr("timestampdiff(MICROSECOND, _prev, ts)")
    batch = (
        union.withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "session_idx",
            F.sum(
                F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
            ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    batch_map = {r.event_id: r.session_idx for r in batch.collect()}
    assert got == batch_map
    # and the disorder cases specifically: one session for user 7,
    # session 2 shared by the out-of-order pair of user 9
    assert got[3] == got[1] == got[2]
    assert got[5] == got[6] == 2
