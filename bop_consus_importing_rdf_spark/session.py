"""SparkSession factory tuned for the sandbox (local[N]) and for scale.

At 100 TB on a real cluster the same builder applies minus ``local`` master:
AQE handles runtime coalescing + skew joins, shuffle partitions are sized by
the driver submit script, and Arrow is on for every pandas-UDF stage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bop-consus-importing-rdf-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cores=None`` → ``local[*]``. ``shuffle_partitions`` defaults to
    1× the core count: re-measured round 2 on the KG pipeline at 32 cores,
    parts=32 beats parts=96 (9.5s vs 11.9s) and split_datasets prefers it
    even more (~25s vs ~35s) — per-exchange file/stream overhead outweighs
    straggler smoothing at these volumes, and AQE's skew-join splitting
    covers the hot keys that the 3× rule was guarding against. On a real
    cluster the submit script sizes this by data volume instead.
    """
    master = f"local[{cores}]" if cores else "local[*]"
    n_shuffle = shuffle_partitions or (cores or os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    return builder.getOrCreate()
